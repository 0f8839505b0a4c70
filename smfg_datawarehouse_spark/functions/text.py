"""Text primitives for the dedup / text-analysis operators.

All pure Catalyst expressions (no UDFs): shingling via
``sequence``+``transform``+``substring``, tokenization via ``split``.
Portable to an ANSI-SQL oracle (DuckDB list comprehensions) so the driver's
differential check can cover them.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def char_shingles(text: Column, k: int = 5, lowercase: bool = True) -> Column:
    """Distinct character k-grams of ``text`` as ``array<string>``.

    Empty array for strings shorter than k.
    """
    t = F.lower(text) if lowercase else text
    n = F.length(t)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: t.substr(i, F.lit(k)),
            )
        )
    )


def word_tokens(text: Column, lowercase: bool = True) -> Column:
    """Whitespace tokens as ``array<string>`` (empty strings removed)."""
    t = F.lower(text) if lowercase else text
    return F.filter(F.split(t, r"\s+"), lambda w: w != "")


def word_shingles(text: Column, k: int = 3, lowercase: bool = True) -> Column:
    """Distinct word k-gram shingles (Broder w-shingling) as ``array<string>``.

    Far more discriminative than character k-grams on small-vocabulary text
    (char-5-gram document frequency is ~100× higher on the test corpus),
    which keeps shingle-join dedup cost near-linear.
    """
    tokens = word_tokens(text, lowercase)
    n = F.size(tokens)
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), n - (k - 1)),
                lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
            )
        )
    )
