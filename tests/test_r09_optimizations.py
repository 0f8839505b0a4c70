"""Round-9 optimization pins: every optimization that changed an
operator's internals gets a focused equivalence test here.

- l25's IVF assignment moved from Catalyst higher-order folds
  (aggregate∘zip_with per pair) to a numpy mapInPandas kernel. The
  kernel must reproduce the expression form BIT-exactly: same IEEE left
  fold over dims, max_by((cos, -cid)) tie semantics (ties -> lowest
  cid), NaN maximal (zero-norm vectors).
- queries.t() memoizes table SCHEMAS per (application, sf_dir, table).
  The memo must never change what a query reads (cold scans, observed
  schema) — pinned by comparing a memoized re-read against a fresh
  inference read.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from smfg_datawarehouse_spark.queries import t
from smfg_datawarehouse_spark.functions.vectors import dot_product, l2_norm

SF = "/root/testdata/sf0.001"


def _hof_assignment(spark, vecs, cents_rows):
    from smfg_datawarehouse_spark.session import local_rows_df

    cents = local_rows_df(
        spark, cents_rows, "cid long, cv array<double>"
    ).withColumn("_cn", l2_norm(F.col("cv")))
    cos = dot_product(F.col("v"), F.col("cv")) / (F.col("_vn") * F.col("_cn"))
    best = F.max_by(
        F.struct("cid"),
        F.struct(F.col("_cos"), (-F.col("cid")).alias("nc")),
    )
    return {
        r["vec_id"]: r["cid"]
        for r in (
            vecs.withColumn("_vn", l2_norm(F.col("v")))
            .crossJoin(F.broadcast(cents))
            .withColumn("_cos", cos)
            .groupBy("vec_id")
            .agg(best.alias("b"))
            .select("vec_id", F.col("b.cid").alias("cid"))
            .collect()
        )
    }


def _numpy_assignment(spark, vecs, cents_rows):
    cents_rows = sorted(cents_rows)
    cids = np.array([c for c, _ in cents_rows], dtype=np.int64)
    C = np.stack([np.asarray(v, dtype=np.float64) for _, v in cents_rows])
    cn_acc = np.zeros(len(C))
    for i in range(C.shape[1]):
        cn_acc = cn_acc + C[:, i] * C[:, i]
    cn = np.sqrt(cn_acc)

    def assign(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            V = np.stack(pdf["v"].values).astype(np.float64)
            vn_acc = np.zeros(len(V))
            dot = np.zeros((len(V), len(C)))
            for i in range(V.shape[1]):
                vi = V[:, i]
                vn_acc = vn_acc + vi * vi
                dot = dot + vi[:, None] * C[:, i][None, :]
            denom = np.sqrt(vn_acc)[:, None] * cn[None, :]
            if np.any(denom == 0.0):
                raise ArithmeticError("zero-norm vector in IVF assignment")
            cos = dot / denom
            pick = np.argmax(cos, axis=1)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].values, "cid": cids[pick]}
            )

    return {
        r["vec_id"]: r["cid"]
        for r in vecs.mapInPandas(assign, schema="vec_id long, cid long").collect()
    }


def test_l25_numpy_assignment_matches_expression_form(spark):
    e = t(spark, SF, "embeddings")
    vecs = e.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    cents_rows = [
        (r["vec_id"], list(r["v"]))
        for r in vecs.where(F.col("vec_id") % 29 == 7).collect()
    ]
    assert _hof_assignment(spark, vecs, cents_rows) == _numpy_assignment(
        spark, vecs, cents_rows
    )


def test_l25_numpy_assignment_tie_edge(spark):
    from smfg_datawarehouse_spark.session import local_rows_df

    # centroid 5 and 9 are IDENTICAL (every cosine ties) -> lowest cid
    # must win (max_by((cos, -cid)) semantics == numpy first-argmax in
    # ascending-cid order)
    cents_rows = [(5, [1.0, 2.0, 3.0]), (9, [1.0, 2.0, 3.0]), (2, [-1.0, 0.5, 0.25])]
    vecs = local_rows_df(
        spark,
        [(1, [2.0, 4.0, 6.0]), (2, [-2.0, 1.0, 0.5]), (7, [3.0, 6.0, 9.0])],
        "vec_id long, v array<double>",
    )
    hof = _hof_assignment(spark, vecs, cents_rows)
    assert hof == _numpy_assignment(spark, vecs, cents_rows)
    assert hof[1] == 5 and hof[7] == 5  # tie broke to the lower cid


def test_l25_zero_norm_raises_like_ansi(spark):
    # the expression form runs under ANSI mode: a zero-norm vector is a
    # DIVIDE_BY_ZERO error, not a NaN — the numpy kernel must keep that
    # contract (l25 itself would have raised before the optimization)
    from smfg_datawarehouse_spark.session import local_rows_df

    cents_rows = [(5, [1.0, 2.0, 3.0])]
    vecs = local_rows_df(
        spark, [(3, [0.0, 0.0, 0.0])], "vec_id long, v array<double>"
    )
    with pytest.raises(Exception, match="DIVIDE_BY_ZERO|zero-norm"):
        _hof_assignment(spark, vecs, cents_rows)
    with pytest.raises(Exception, match="zero-norm"):
        _numpy_assignment(spark, vecs, cents_rows)


def test_table_schema_memo_is_schema_only(spark):
    from smfg_datawarehouse_spark import queries as qmod

    df1 = t(spark, SF, "orders")  # first load observes + memoizes
    key = (spark.sparkContext.applicationId, SF, "orders")
    assert key in qmod._TABLE_SCHEMA_MEMO
    df2 = t(spark, SF, "orders")  # memoized load
    fresh = spark.read.parquet(f"{SF}/orders.parquet")
    assert df2.schema == fresh.schema == df1.schema
    assert sorted(map(tuple, df2.collect())) == sorted(
        map(tuple, fresh.collect())
    )


def test_events_schema_memo_preserves_ts_normalization(spark):
    ev1 = t(spark, SF, "events")
    ev2 = t(spark, SF, "events")  # memoized path
    assert ev1.schema == ev2.schema
    assert str(ev2.schema["ts"].dataType) == "TimestampType()"
    assert ev1.count() == ev2.count()
