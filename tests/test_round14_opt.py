"""Round-14 optimization-round tests: scale-adaptive session defaults.

The tuned session's ``spark.sql.shuffle.partitions`` must derive from the
session's core count (guide §2: partitioning scale-adaptive, never a
constant tuned for one box) with an explicit production override.
"""

from __future__ import annotations

import os
from unittest import mock

from pulsar_topic_deduplicator_spark.session import default_shuffle_partitions


def test_width_follows_numeric_cpu_count():
    with mock.patch.dict(os.environ, {}, clear=False):
        os.environ.pop("SPARK_GRAFT_SHUFFLE_PARTITIONS", None)
        assert default_shuffle_partitions("8") == "8"
        assert default_shuffle_partitions("32") == "32"


def test_width_falls_back_to_machine_cores_for_wildcard():
    with mock.patch.dict(os.environ, {}, clear=False):
        os.environ.pop("SPARK_GRAFT_SHUFFLE_PARTITIONS", None)
        assert default_shuffle_partitions("*") == str(os.cpu_count() or 8)


def test_explicit_production_override_wins():
    with mock.patch.dict(
        os.environ, {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "4096"}, clear=False
    ):
        assert default_shuffle_partitions("32") == "4096"
