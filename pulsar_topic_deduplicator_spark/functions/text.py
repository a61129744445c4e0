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

    Built as ``arrays_zip`` of the n shifted ``slice``s of the word array,
    then one ``transform`` joining each zipped tuple with spaces. The zip
    evaluates each slice argument ONCE per row — the earlier
    ``element_at(words, i+k)``-inside-a-lambda formulation re-evaluated the
    ``split`` subtree per gram per position (HOF lambda bodies are
    interpreted without CSE), an O(n_words²) blowup measured at ~9× wall
    on the sf0.1 corpus. Output is identical including gram order.

    Semantics match the DuckDB oracle CTE (1-based list slicing over
    ``string_split``). Returns array<string> (deduplicated).
    """
    words = whitespace_tokens(text)
    count = F.size(words) - (n - 1)
    zipped = F.arrays_zip(*[F.slice(words, k + 1, count) for k in range(n)])
    grams = F.transform(
        zipped,
        lambda s: F.concat_ws(" ", *[s[str(k)] for k in range(n)]),
    )
    # CASE guard: for docs shorter than n words, slice(words, k, count<=0)
    # would be invalid; the WHEN branch is evaluated lazily per row, so
    # short docs yield [].
    return F.when(count > 0, F.array_distinct(grams)).otherwise(
        F.array().cast("array<string>")
    )
