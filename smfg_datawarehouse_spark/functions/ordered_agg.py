"""Deterministic ordered string aggregation.

The reference's one non-trivial aggregate is MySQL's
``GROUP_CONCAT(expr ORDER BY key SEPARATOR ', ')``
(``source_code/sql/Staging_Extraction_Metadata_Query.sql:37``), used to build
the per-table projection list in config (ColumnID) order. Spark has no
ordered ``string_agg``; ``collect_list`` order is partition-dependent, so the
only deterministic construction is sort-inside-the-array:

    collect_list(struct(order_key, value)) -> array_sort -> transform -> concat_ws

``array_sort`` on structs compares fields left-to-right, so the order key must
be the first struct field. This avoids MySQL's ``group_concat_max_len`` cap
entirely (``1. Metadata Creation.sql:150`` works around a 1 MB limit).

Scale note: the aggregated array lives in one row; this is only for
config-scale groups (hundreds of columns per table), never for data-scale
aggregation — exactly the reference's usage.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def ordered_concat_ws(sep: str, order_by: Column | str, value: Column | str) -> Column:
    """``GROUP_CONCAT(value ORDER BY order_by SEPARATOR sep)`` — deterministic.

    Usable inside ``groupBy(...).agg(...)``.
    """
    order_col = F.col(order_by) if isinstance(order_by, str) else order_by
    value_col = F.col(value) if isinstance(value, str) else value
    pairs = F.collect_list(F.struct(order_col.alias("k"), value_col.alias("v")))
    return F.concat_ws(sep, F.transform(F.array_sort(pairs), lambda s: s["v"]))
