"""Property-based checks (hypothesis): algebraic invariants the engine's
scale patterns rely on, exercised over randomized small inputs — the
determinism story can't rest on fixture luck alone.

Examples are kept few and tiny: each one runs real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["a", "b", "c"]),  # few keys → every key is hot
        st.floats(
            min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
        ),
    ),
    min_size=1,
    max_size=50,
)

_SETTINGS = settings(
    max_examples=10,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(rows=_ROWS, buckets=st.sampled_from([1, 2, 7, 16]))
@_SETTINGS
def test_salted_agg_equals_plain_agg(spark, rows, buckets):
    """Two-stage salted aggregation must equal the single-stage GROUP BY for
    any data and any bucket count — decimal partials are associative, so
    the salt can never change the result (the invariant that makes skew
    mitigation safe to apply blindly)."""
    from smfg_datawarehouse_spark.functions.skew import salted_two_stage_agg

    df = spark.createDataFrame(
        [(k, i, v) for i, (k, v) in enumerate(rows)], "k STRING, id LONG, v DOUBLE"
    )
    plain = {
        r["k"]: (r["s"], r["c"])
        for r in df.groupBy("k")
        .agg(
            F.sum(F.col("v").cast("decimal(30,6)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("c"),
        )
        .collect()
    }
    salted = {
        r["k"]: (r["s"], r["c"])
        for r in salted_two_stage_agg(
            df,
            keys=["k"],
            salt_from=F.col("id"),
            partial_aggs=[
                F.sum(F.col("v").cast("decimal(30,6)")).alias("_s"),
                F.count(F.lit(1)).alias("_c"),
            ],
            final_aggs=[
                F.sum("_s").cast("double").alias("s"),
                F.sum("_c").cast("long").alias("c"),
            ],
            buckets=buckets,
        ).collect()
    }
    assert salted == plain


@given(
    target_rows=st.lists(
        st.tuples(st.integers(0, 9), st.integers(0, 100)), min_size=0, max_size=20
    ),
    update_rows=st.lists(
        st.tuples(st.integers(0, 9), st.integers(200, 300)), min_size=0, max_size=20
    ),
)
@_SETTINGS
def test_merge_upsert_idempotent_and_updates_win(spark, target_rows, update_rows):
    """MERGE semantics under randomized key overlap: updates win on
    matched keys, unmatched target rows survive, and re-applying the same
    update batch is a no-op (idempotency — what makes retry-safe loads)."""
    from smfg_datawarehouse_spark.transform import merge_upsert

    # one row per key on each side (MERGE requires unique source keys)
    t_rows = list({k: (k, v) for k, v in target_rows}.values())
    u_rows = list({k: (k, v) for k, v in update_rows}.values())
    target = spark.createDataFrame(t_rows or [(None, None)], "k INT, v INT").where(
        "k IS NOT NULL"
    )
    updates = spark.createDataFrame(u_rows or [(None, None)], "k INT, v INT").where(
        "k IS NOT NULL"
    )
    once = merge_upsert(target, updates, ["k"])
    got = {r["k"]: r["v"] for r in once.collect()}
    expected = {k: v for k, v in t_rows}
    expected.update({k: v for k, v in u_rows})
    assert got == expected
    twice = merge_upsert(once, updates, ["k"])
    assert {r["k"]: r["v"] for r in twice.collect()} == expected
