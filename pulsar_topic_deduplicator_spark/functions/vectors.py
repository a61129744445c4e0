"""Vector math over ``array<float>`` embedding columns (similarity tier).

All arithmetic happens in **double**: the parquet embeddings are float32, and
both Spark's ``aggregate`` fold and DuckDB's ``list_dot_product`` accumulate
left-to-right, so after casting both operands to double the results agree
bit-for-bit (verified empirically) — which keeps the similarity operators
oracle-checkable without rounding fudges.

Built-in higher-order functions (``zip_with`` + ``aggregate``) run inside the
JVM — no Python crossing — and vectorize fine at 64-dim × millions of rows.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _as_double(v: Column) -> Column:
    return v.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    prod = F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y)
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine_similarity(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))
