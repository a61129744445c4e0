"""Corpus-trained NB classifier: separable fixture docs must be
predicted by their word evidence, NULL lang must train as the negative
class, NULL text must vanish like the oracle's unnest, and the whole
fixture must hash-match the DuckDB oracle (the engine-parity pin)."""

from __future__ import annotations

import duckdb
import pytest

from pulsar_topic_deduplicator_spark.operators.classify import (
    ORACLES,
    nb_classifier_scores,
)

# words "aa"/"bb" are class-pure evidence; doc 4 mixes them 3:1 toward
# the negative class; doc 5 has a NULL label (trains negative); doc 6
# has NULL text (no evidence rows at all)
DOCS = [
    (0, "aa aa aa", "en", "s", 8),
    (1, "aa aa", "en", "s", 5),
    (2, "bb bb bb", "fr", "s", 8),
    (3, "bb bb", "de", "s", 5),
    (4, "bb bb bb aa", "fr", "s", 11),
    (5, "bb cc", None, "s", 5),
    (6, None, "en", "s", 0),
]


@pytest.fixture(scope="module")
def nb_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("nb")
    spark.createDataFrame(
        DOCS,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))
    return str(path)


def test_nb_predictions_follow_evidence(spark, nb_dir):
    rows = {r["doc_id"]: r for r in nb_classifier_scores(spark, nb_dir).collect()}
    # NULL text: no token rows, absent from the scored output
    assert set(rows) == {0, 1, 2, 3, 4, 5}
    # pure-evidence docs classify by their words
    assert rows[0]["is_pos_pred"] and rows[1]["is_pos_pred"]
    assert not rows[2]["is_pos_pred"] and not rows[3]["is_pos_pred"]
    # the mixed doc leans 3:1 negative
    assert not rows[4]["is_pos_pred"]
    # the NULL-lang doc trained (and scores) as negative-class evidence
    assert not rows[5]["is_pos_pred"]
    # prediction is exactly the sign of the integer logit
    for r in rows.values():
        assert r["is_pos_pred"] == (r["logit_nanonats"] > 0)
    assert rows[4]["n_words"] == 4


def test_nb_matches_oracle_on_fixture(spark, nb_dir):
    got = sorted(
        tuple(r) for r in nb_classifier_scores(spark, nb_dir).collect()
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"'{nb_dir}/documents.parquet/*.parquet'"
    )
    want = sorted(
        tuple(r) for r in con.execute(ORACLES["nb_classifier_scores"]).fetchall()
    )
    assert got == want
