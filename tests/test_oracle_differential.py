"""Differential test mirroring the driver's correctness gate:

run every registered query on Spark AND its DuckDB oracle on the same
parquet tables, then compare row count, column names, and an
order-insensitive value multiset (values normalized: floats rounded to
9 significant-ish decimals for comparison robustness in THIS test; the
driver's hash check is stricter, which is why the queries themselves are
written for bit-determinism).
"""

from __future__ import annotations

import math

import duckdb
import pytest

from smfg_datawarehouse_spark import queries as qmod

SF_DIR = "/root/testdata/sf0.001"

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return f"{v:.10g}"
    return str(v)


def _rowset(rows):
    return sorted(",".join(_norm(v) for v in row) for row in rows)


ALL = sorted(qmod.all_queries().keys())


@pytest.mark.parametrize("name", ALL)
def test_query_matches_oracle(spark, name):
    queries = qmod.all_queries()
    oracles = qmod.all_oracles()
    if name not in oracles:
        df = queries[name](spark, SF_DIR)
        assert df.count() >= 0  # rows-only check (non-SQL-expressible op)
        return
    sdf = queries[name](spark, SF_DIR)
    spark_cols = sdf.columns
    spark_rows = [tuple(r) for r in sdf.collect()]

    con = _duck()
    res = con.execute(oracles[name])
    duck_cols = [d[0] for d in res.description]
    duck_rows = res.fetchall()

    assert sorted(spark_cols) == sorted(duck_cols), f"{name}: column mismatch"
    assert len(spark_rows) == len(duck_rows), f"{name}: row count mismatch"

    # compare by column-name-sorted tuples (driver behavior)
    sidx = [spark_cols.index(c) for c in sorted(spark_cols)]
    didx = [duck_cols.index(c) for c in sorted(duck_cols)]
    s_set = _rowset([tuple(r[i] for i in sidx) for r in spark_rows])
    d_set = _rowset([tuple(r[i] for i in didx) for r in duck_rows])
    mism = [(a, b) for a, b in zip(s_set, d_set) if a != b]
    assert s_set == d_set, f"{name}: value mismatch, first diffs: {mism[:3]}"


def test_exact_value_determinism(spark):
    """Float aggregates must match the oracle BIT-exactly (no rounding)."""
    queries = qmod.all_queries()
    oracles = qmod.all_oracles()
    name = "q01_pricing_summary"
    sdf = queries[name](spark, SF_DIR)
    cols = sdf.columns
    srows = {tuple(r[c] for c in ["l_returnflag", "l_linestatus"]): r for r in sdf.collect()}
    con = _duck()
    res = con.execute(oracles[name])
    dcols = [d[0] for d in res.description]
    for drow in res.fetchall():
        d = dict(zip(dcols, drow))
        key = (d["l_returnflag"], d["l_linestatus"])
        srow = srows[key]
        for c in cols:
            sv, dv = srow[c], d[c]
            if isinstance(sv, float):
                assert sv == dv, f"{c}@{key}: spark={sv!r} duck={dv!r}"
