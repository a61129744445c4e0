"""Round-trip the driver tables through each batch format with explicit
schemas — source/sink coverage beyond parquet."""

from __future__ import annotations

import pytest

from pulsar_topic_deduplicator_spark.sources.formats import read_table, write_table
from pulsar_topic_deduplicator_spark.sources.io import load_table


@pytest.mark.parametrize("fmt", ["parquet", "json", "csv"])
def test_roundtrip_documents(spark, sf_dir, tmp_path, fmt):
    src = load_table(spark, sf_dir, "documents")
    path = str(tmp_path / f"docs_{fmt}")
    write_table(src, path, fmt=fmt)
    back = read_table(spark, path, src.schema, fmt=fmt)
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_roundtrip_events_with_timestamps(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "events")
    path = str(tmp_path / "events_rt")
    write_table(src, path, fmt="parquet")
    back = read_table(spark, path, src.schema, fmt="parquet")
    assert back.count() == src.count()
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, src.collect()))


def test_pulsar_options_shape():
    from pulsar_topic_deduplicator_spark.sources.formats import (
        pulsar_reader_options,
    )

    opts = pulsar_reader_options(
        "pulsar://broker:6650", "persistent://tenant/ns/topic-.*"
    )
    assert opts["topicsPattern"].endswith("topic-.*")
    assert opts["startingOffsets"] == "earliest"
