"""Degenerate-document regression (ADVICE r6): a NULL ``text`` used to make
``chunk_documents`` throw at runtime (``sequence(0, -2, stride)``) and
``lm_bigram_nll`` throw on a negative ``slice`` length, while the DuckDB
oracles just emit no rows — a single NULL document crashed the whole query
instead of diverging gracefully. Both operators now filter NULLs at the
scan, and this test pins full engine parity on a corpus of every degenerate
shape: NULL, empty string, one word, and a normal document."""

from __future__ import annotations

import pytest

from .oracle_harness import compare

ROWS = [
    (0, None, "en", "src0"),
    (1, "", "en", "src0"),
    (2, "one", "en", "src1"),
    (3, "the quick brown fox jumps over the lazy dog the end", "en", "src1"),
]


@pytest.fixture(scope="module")
def degenerate_dir(spark, tmp_path_factory):
    path = tmp_path_factory.mktemp("degen")
    spark.createDataFrame(
        [(i, t, lang, src, len(t) if t else 0) for i, t, lang, src in ROWS],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.mode("overwrite").parquet(str(path / "documents.parquet"))
    return str(path)


@pytest.fixture(scope="module")
def degenerate_duck(degenerate_dir):
    import duckdb

    con = duckdb.connect()
    # Spark writes the table as a parquet DIRECTORY — glob the parts
    con.execute(
        "CREATE VIEW documents AS "
        f"SELECT * FROM '{degenerate_dir}/documents.parquet/*.parquet'"
    )
    yield con
    con.close()


@pytest.mark.parametrize(
    "name",
    [
        "chunk_documents",
        "lm_bigram_nll",
        "dedup_paragraphs",
        "near_dup_paragraphs",
        "dedup_paragraphs_fuzzy",
        "duplicate_substring_spans",
        "dedup_substrings_global",
        "dedup_spans_within_doc",
        "dsir_select",
        "decontaminate_fuzzy",
        "vocab_coverage",
        "bpe_pair_counts",
        "bpe_merge_steps",
        "bpe_encode_token_counts",
        "dsir_resample",
        "doc_novelty_scores",
        "dedup_docs_by_url",
        "domain_attrition_report",
    ],
)
def test_degenerate_docs_engine_parity(name, spark, degenerate_dir, degenerate_duck):
    import __spark_entry__ as entrymod

    df = entrymod.queries()[name](spark, degenerate_dir)
    result = compare(df, degenerate_duck, entrymod.oracle_sql()[name])
    assert result["match"], f"{name}: {result}"
    # the NULL doc must contribute zero rows (not a crash) on both engines;
    # corpus-level aggregates (no per-doc column) are covered by the
    # parity assert alone — the NULL doc's contribution is provably zero
    # because the oracle filters it at the scan
    if "doc_id" in df.columns:
        null_doc = "doc_id = 0"
    elif "doc_a" in df.columns:
        null_doc = "doc_a = 0 OR doc_b = 0"
    else:
        return
    assert df.filter(null_doc).count() == 0
