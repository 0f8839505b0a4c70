"""Vector math over ``array<float/double>`` columns — pure Catalyst expressions.

Built for the similarity-search surface (BASELINE.json extension ops). Using
``F.zip_with`` + ``F.aggregate`` keeps the math in the JVM with codegen; a
Pandas-UDF variant exists in ``operators/similarity.py`` for comparison but
benchmarks slower at small k and equal at large batch, so the expression form
is the default.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dot_product(a: Column, b: Column) -> Column:
    """Elementwise dot product of two array columns."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v)
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity; NULL-safe on zero-norm vectors (returns NULL)."""
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom != 0, dot_product(a, b) / denom)
