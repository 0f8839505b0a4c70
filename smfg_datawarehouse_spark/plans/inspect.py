"""Physical-plan inspection helpers — plan quality as a testable property.

At 100 TB the difference between a good and a bad plan is the job: a scan
that reads all columns for a 2-column projection, a dimension join that
sort-merges instead of broadcasting, or an accidental cartesian product
each turn into cluster-scale incidents. These helpers extract the facts
that matter from ``explain("formatted")`` so the test suite can pin them.
"""

from __future__ import annotations

import contextlib
import io
import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def pushed_filters(df: DataFrame) -> list[str]:
    """All PushedFilters entries (one string per scan)."""
    return re.findall(r"PushedFilters: \[([^\]]*)\]", formatted_plan(df))


def partition_filters(df: DataFrame) -> list[str]:
    """All PartitionFilters entries (one string per scan) — the witness
    that a predicate prunes whole partition directories at planning time
    instead of being evaluated row-by-row after I/O."""
    return re.findall(r"PartitionFilters: \[([^\]]*)\]", formatted_plan(df))


def read_schemas(df: DataFrame) -> list[list[str]]:
    """Column lists actually read by each scan (column-pruning witness)."""
    out = []
    for m in re.finditer(r"ReadSchema: struct<([^>]*)>", formatted_plan(df)):
        cols = [c.split(":")[0].strip() for c in m.group(1).split(",") if c.strip()]
        out.append(cols)
    return out


def broadcast_join_count(df: DataFrame) -> int:
    # count operator-detail headers only — the tree section repeats names
    return len(re.findall(r"^\(\d+\) BroadcastHashJoin", formatted_plan(df), re.M))


def exchange_count(df: DataFrame) -> int:
    """Number of shuffle Exchange operators — the scale-cost witness."""
    return len(re.findall(r"^\(\d+\) Exchange", formatted_plan(df), re.M))


def assert_no_cartesian(df: DataFrame) -> None:
    plan = formatted_plan(df)
    assert "CartesianProduct" not in plan, "plan contains a cartesian product"


def scan_count(df: DataFrame) -> int:
    """Number of physical source scans (operator-detail headers only —
    the tree section repeats node names)."""
    return len(re.findall(r"^\(\d+\) Scan ", formatted_plan(df), re.M))
