"""Tokenization and shingling expression builders (text-analysis tier).

NOT in the reference (its payload is opaque bytes — SURVEY.md §2.3); these
are the building blocks for the training-data-pipeline operators (n-gram
Jaccard, MinHash, SimHash, text stats). All built-in expressions — no Python
UDFs — so they stay inside whole-stage codegen at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def whitespace_tokens(text: Column) -> Column:
    """Split on single spaces (the documents corpus is single-space joined).
    DuckDB oracle equivalent: ``string_split(text, ' ')``."""
    return F.split(text, " ")


def shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a document.

    ``transform(sequence(1, n_words - n + 1), i -> concat_ws(' ',
    words[i..i+n-1]))`` with 1-based ``element_at`` indexing — the same
    1-based indexing DuckDB's list access uses, so the oracle SQL mirrors
    this expression token for token. Returns array<string> (deduplicated).
    """
    words = whitespace_tokens(text)
    count = F.size(words) - (n - 1)
    grams = F.transform(
        F.sequence(F.lit(1), count),
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + k).cast("int")) for k in range(n)]
        ),
    )
    # CASE guard: for docs shorter than n words, sequence(1, count<=0) would
    # descend (and element_at would go out of bounds under ANSI mode); the
    # WHEN branch is evaluated lazily per row, so short docs yield [].
    return F.when(count > 0, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
