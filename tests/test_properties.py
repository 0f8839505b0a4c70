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


_EVENT_ROWS = st.lists(
    st.tuples(
        st.integers(min_value=1, max_value=3),  # few users → multi-session users
        st.integers(min_value=0, max_value=60 * 60 * 24 * 3),  # ts offset (s)
        st.floats(min_value=0.0, max_value=100.0, allow_nan=False),
    ),
    min_size=1,
    max_size=60,
    unique_by=lambda r: (r[0], r[1]),  # unique (user, ts): tie-break not under test
)


@given(rows=_EVENT_ROWS)
@_SETTINGS
def test_sessionization_invariants(spark, rows):
    """Gaps-and-islands sessionization invariants for any event stream:
    (1) session event counts sum to the input count, (2) no session spans
    a silence: consecutive same-user sessions are separated by >30 min
    (else they'd be one session), and (3) every session's span is
    consistent (start <= end, and a 1-event session has start == end)."""
    import datetime as dt

    from pyspark.sql import Window as W

    base = dt.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (i, u, base + dt.timedelta(seconds=off), v)
            for i, (u, off, v) in enumerate(rows)
        ],
        "event_id LONG, user_id LONG, ts TIMESTAMP, value DOUBLE",
    )
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w)
    sess = (
        df.withColumn(
            "is_start",
            F.when(
                prev.isNull() | (F.col("ts") > prev + F.expr("INTERVAL 30 MINUTE")),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "session_no",
            F.sum("is_start").over(w.rowsBetween(W.unboundedPreceding, 0)),
        )
        .groupBy("user_id", "session_no")
        .agg(
            F.min("ts").alias("start"),
            F.max("ts").alias("end"),
            F.count(F.lit(1)).alias("n"),
        )
        .collect()
    )
    assert sum(r["n"] for r in sess) == len(rows)
    by_user: dict = {}
    for r in sess:
        assert r["start"] <= r["end"]
        by_user.setdefault(r["user_id"], []).append(r)
    for spans in by_user.values():
        spans.sort(key=lambda r: r["session_no"])
        for a, b in zip(spans, spans[1:]):
            assert (b["start"] - a["end"]).total_seconds() > 30 * 60


_SOURCE_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["s1", "s2", "s3", "s4"]),
        st.integers(min_value=1, max_value=10_000),  # token mass per doc
    ),
    min_size=1,
    max_size=30,
)


@given(rows=_SOURCE_ROWS)
@_SETTINGS
def test_temperature_weights_distribution(spark, rows):
    """Temperature-scaled source weights (alpha=0.5, exact pico-unit
    normalization) must form a distribution: sum ~= 1 within one unit of
    quantization per source, every weight positive, and the ordering of
    weights must follow the ordering of raw token mass (monotone map)."""
    df = spark.createDataFrame(
        [(s, n) for s, n in rows], "source STRING, n LONG"
    )
    s = df.groupBy("source").agg(F.sum("n").cast("long").alias("n_s"))
    tot = s.agg(F.sum("n_s").cast("long").alias("n"))
    from pyspark.sql import Window as W

    p_raw = F.col("n_s").cast("double") / F.col("n")
    u = F.floor(F.sqrt(p_raw) * 1e12 + 0.5).cast("long")
    out = (
        s.join(F.broadcast(tot))
        .select("source", "n_s", u.alias("u"))
        .select(
            "source",
            "n_s",
            (F.col("u").cast("double") / F.sum("u").over(W.partitionBy()).cast("double")).alias(
                "p_alpha"
            ),
        )
        .collect()
    )
    total = sum(r["p_alpha"] for r in out)
    assert abs(total - 1.0) < 1e-9
    assert all(r["p_alpha"] > 0 for r in out)
    by_mass = sorted(out, key=lambda r: r["n_s"])
    for a, b in zip(by_mass, by_mass[1:]):
        assert a["p_alpha"] <= b["p_alpha"] + 1e-15


def test_epoch_budget_conservation(spark):
    """x80's integer allocation must never exceed the budget (Σ floor
    terms ≤ B) and must be near-complete (shortfall < n_sources, the
    max total floor loss) — the invariant that makes the plan a real
    allocation instead of an estimate."""
    from smfg_datawarehouse_spark.operators.text_sampling import (
        x80_epoch_budget_plan,
    )

    rows = x80_epoch_budget_plan(spark, "/root/testdata/sf0.001").collect()
    total = sum(r["alloc_tokens"] for r in rows)
    assert total <= 1_000_000
    assert 1_000_000 - total < len(rows)
    for r in rows:
        assert (r["alloc_tokens"] > r["natural_tokens"]) == r["repeats_data"]


def test_dup_histogram_mass_conservation(spark):
    """x83's histogram must partition the corpus exactly: Σ n_docs over
    bands == |documents|, and removable == n_docs − n_clusters per band."""
    from pyspark.sql import functions as F

    from smfg_datawarehouse_spark.operators.text_quality import (
        x83_dup_cluster_histogram,
    )
    from smfg_datawarehouse_spark.queries import t

    sf = "/root/testdata/sf0.001"
    rows = x83_dup_cluster_histogram(spark, sf).collect()
    n_corpus = t(spark, sf, "documents").count()
    assert sum(r["n_docs"] for r in rows) == n_corpus
    for r in rows:
        assert r["removable_docs"] == r["n_docs"] - r["n_clusters"]
    assert abs(sum(r["doc_frac"] for r in rows) - 1.0) < 1e-12


def test_rfm_quartiles_balanced(spark):
    """q85's NTILE(4) must produce balanced quartiles (sizes differ by at
    most 1) on every dimension — the equal-count contract segmentation
    relies on — and every user must appear exactly once."""
    from collections import Counter

    from smfg_datawarehouse_spark.operators.events_analytics import (
        q85_rfm_segmentation,
    )

    rows = q85_rfm_segmentation(spark, "/root/testdata/sf0.001").collect()
    assert len({r["user_id"] for r in rows}) == len(rows)
    for col in ("r_quartile", "f_quartile", "m_quartile"):
        sizes = Counter(r[col] for r in rows)
        assert set(sizes) == {1, 2, 3, 4}
        assert max(sizes.values()) - min(sizes.values()) <= 1


def test_lang_confusion_rows_normalize(spark):
    """x82's row fractions must sum to 1 within each declared language and
    cell counts must total the corpus."""
    from collections import defaultdict

    from smfg_datawarehouse_spark.operators.text_quality import (
        x82_lang_confusion,
    )
    from smfg_datawarehouse_spark.queries import t

    sf = "/root/testdata/sf0.001"
    rows = x82_lang_confusion(spark, sf).collect()
    assert sum(r["n_docs"] for r in rows) == t(spark, sf, "documents").count()
    per_lang = defaultdict(float)
    for r in rows:
        per_lang[r["declared_lang"]] += r["row_frac"]
    for lang, s in per_lang.items():
        assert abs(s - 1.0) < 1e-12, (lang, s)


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=20,
    )
)
@_SETTINGS
def test_triangle_counts_match_bruteforce(spark, edges):
    """Degree-ordered wedge counting must equal the O(n^3) definition on
    any small graph — the orientation trick is a pure optimization and can
    never change a count (the invariant that makes it safe at scale)."""
    from smfg_datawarehouse_spark.operators.dedup import triangle_counts

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    eset = set(und)
    nodes = sorted({n for e in und for n in e})
    expect_tri = {n: 0 for n in nodes}
    expect_deg = {n: 0 for n in nodes}
    for a, b in und:
        expect_deg[a] += 1
        expect_deg[b] += 1
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            for c in nodes[nodes.index(b) + 1:]:
                if (a, b) in eset and (b, c) in eset and (a, c) in eset:
                    for n in (a, b, c):
                        expect_tri[n] += 1
    df = spark.createDataFrame(und, "doc_a long, doc_b long")
    rows = {r["doc_id"]: r for r in triangle_counts(df).collect()}
    assert {k: v["triangles"] for k, v in rows.items()} == expect_tri
    assert {k: v["degree"] for k, v in rows.items()} == expect_deg


@given(
    sizes=st.lists(st.integers(min_value=0, max_value=10**12), min_size=0, max_size=200),
    target=st.integers(min_value=1, max_value=40),
)
@settings(max_examples=300, deadline=None)
def test_contiguous_run_planner_invariants(sizes, target):
    """sorted_compact's planner must, for ANY size distribution: produce
    exactly min(target, n) runs, every run non-empty, runs contiguous and
    covering 0..n-1 in order (clustering preservation depends on it),
    and never let one run take everything while others starve when a
    fairer contiguous split exists (max run ≤ total when n ≥ target)."""
    from smfg_datawarehouse_spark.sources.lake import plan_contiguous_runs

    runs = plan_contiguous_runs(sizes, target)
    n = len(sizes)
    if n == 0:
        assert runs == []
        return
    assert len(runs) == min(target, n)
    assert all(runs[i] for i in range(len(runs)))
    flat = [j for run in runs for j in run]
    assert flat == list(range(n)), "runs must be contiguous, ordered, covering"
    # balance sanity: no run other than a single-item run may exceed
    # total - (remaining_runs_min_one_item): trivially true, but DO check
    # the pathological regression shape — equal sizes split evenly
    if n >= target and len(set(sizes)) == 1 and n % target == 0:
        assert {len(r) for r in runs} == {n // target}


@given(
    vals=st.lists(
        st.one_of(
            st.integers(min_value=-10**9, max_value=10**9),
            st.floats(allow_nan=False, allow_infinity=False, width=32),
        ),
        min_size=2,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_manifest_enc_preserves_numeric_order(vals):
    """ManifestTree._enc must preserve comparison order for homogeneous
    numeric prune columns — the str() regression made '9' > '11'."""
    from smfg_datawarehouse_spark.sources.manifest import ManifestTree

    enc = [ManifestTree._enc(v) for v in vals]
    for a, b in zip(sorted(vals), sorted(vals)[1:]):
        ea, eb = ManifestTree._enc(a), ManifestTree._enc(b)
        assert ea <= eb


@given(days=st.lists(st.integers(min_value=0, max_value=400000), min_size=2, max_size=50))
@settings(max_examples=100, deadline=None)
def test_manifest_enc_preserves_temporal_order(days):
    """ISO encoding of dates/datetimes must order chronologically."""
    import datetime as dt

    from smfg_datawarehouse_spark.sources.manifest import ManifestTree

    base = dt.datetime(1970, 1, 1)
    stamps = sorted(base + dt.timedelta(minutes=d) for d in days)
    enc = [ManifestTree._enc(s) for s in stamps]
    assert enc == sorted(enc)


@given(
    toks=st.lists(
        st.sampled_from(["alpha", "beta", "gamma", "delta", "eps",
                         "zeta", "eta", "theta"]),
        min_size=4,
        max_size=24,
    ),
    ins_at=st.integers(0, 24),
    new_tok=st.sampled_from(["omega", "kappa", "lambda"]),
)
@_SETTINGS
def test_cdc_chunking_self_synchronizes(spark, toks, ins_at, new_tok):
    """The property that makes content-defined chunking worth its cost
    over x53's fixed windows: inserting one token may change the chunk
    it lands in (and merge/split at that point), but every chunk that
    starts AFTER the next boundary past the insertion must be
    byte-identical in both versions — boundaries depend only on token
    content, so the chunk stream re-aligns. Verified as: the edited
    doc's chunk-hash multiset differs from the original's by at most
    the chunks overlapping the insertion point (suffix chunk sequences
    are equal once re-aligned)."""
    from smfg_datawarehouse_spark.operators.dedup import cdc_chunks

    ins_at = min(ins_at, len(toks))
    edited = toks[:ins_at] + [new_tok] + toks[ins_at:]
    docs = spark.createDataFrame(
        [(0, " ".join(toks)), (1, " ".join(edited))], "doc_id long, text string"
    )
    rows = cdc_chunks(docs).collect()
    orig = [r["chunk_hash"] for r in sorted(
        (r for r in rows if r["doc_id"] == 0), key=lambda r: r["chunk_id"])]
    edit = [r["chunk_hash"] for r in sorted(
        (r for r in rows if r["doc_id"] == 1), key=lambda r: r["chunk_id"])]
    # chunks strictly BEFORE the insertion's chunk are identical
    # (prefix stability) and chunks strictly AFTER the insertion's chunk
    # re-align (suffix stability): compare longest common prefix +
    # suffix; the differing middle is at most 2 chunks (split/merge at
    # the insertion point).
    p = 0
    while p < min(len(orig), len(edit)) and orig[p] == edit[p]:
        p += 1
    s = 0
    while (
        s < min(len(orig), len(edit)) - p
        and orig[len(orig) - 1 - s] == edit[len(edit) - 1 - s]
    ):
        s += 1
    assert len(orig) - p - s <= 2, (toks, ins_at, new_tok, orig, edit)
    assert len(edit) - p - s <= 2


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda p: p[0] != p[1]),
        min_size=1,
        max_size=20,
    ),
    cap=st.sampled_from([1, 2, 64]),
)
@_SETTINGS
def test_adamic_adar_matches_bruteforce(spark, edges, cap):
    """The wedge-join AA construction must equal the textbook definition
    (restricted to centers with deg <= cap) on any small graph — the
    degree cap is a recall trade, never a score change on surviving
    pairs."""
    from smfg_datawarehouse_spark.operators.dedup import adamic_adar_scores

    und = sorted({(min(a, b), max(a, b)) for a, b in edges})
    eset = set(und)
    adj: dict[int, set[int]] = {}
    for a, b in und:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)
    deg = {n: len(v) for n, v in adj.items()}
    expect: dict[tuple[int, int], tuple[int, int]] = {}
    nodes = sorted(adj)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            zs = [z for z in adj[a] & adj[b] if deg[z] <= cap]
            if zs:
                expect[(a, b)] = (len(zs), sum(1000000 // deg[z] for z in zs))
    df = spark.createDataFrame(und, "doc_a long, doc_b long")
    rows = adamic_adar_scores(df, deg_cap=cap).collect()
    got = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], round(r["aa_score"] * 1000000))
        for r in rows
    }
    assert got == expect
    for r in rows:
        assert r["is_edge"] == ((r["doc_a"], r["doc_b"]) in eset)


_DOC_ROWS = st.lists(
    st.tuples(
        st.sampled_from(["en", "fr", "de"]),
        st.sampled_from(["s0", "s1", "s2", "s3"]),
        st.integers(min_value=1, max_value=400),  # n_chars proxy
    ),
    min_size=2,
    max_size=40,
)


@given(rows=_DOC_ROWS)
@_SETTINGS
def test_drift_tvd_invariants(spark, rows, tmp_path_factory):
    """x161's TVD must satisfy the metric's algebra on ANY corpus split:
    0 <= tvd <= 1, the exact rational equals the double
    (numer/denom == tvd bit-for-bit), and an arrival batch distributed
    IDENTICALLY to the standing corpus (every doc duplicated into both
    versions) yields tvd == 0 on every dimension."""
    from smfg_datawarehouse_spark import queries as qmod

    d = tmp_path_factory.mktemp("prop_x161")
    # doc_id % 10 == 7 marks arrivals: build a corpus where every
    # (lang, source, len) profile appears in BOTH versions -> zero drift
    docs = []
    for i, (lang, src, n) in enumerate(rows):
        text = "w " * max(1, n // 2)
        docs.append((i * 10, text, lang, src, len(text)))      # V1 member
        docs.append((i * 10 + 7, text, lang, src, len(text)))  # arrival twin
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    out = qmod.all_queries()["x161_corpus_drift_tvd"](spark, str(d)).collect()
    assert len(out) == 3
    for r in out:
        assert 0.0 <= r["tvd"] <= 1.0
        assert r["tvd"] == r["tvd_numer"] / r["tvd_denom"]
        assert r["tvd"] == 0.0, f"identical halves must not drift: {r}"


def test_crossversion_stability_conservation(spark, tmp_path_factory):
    """x156: across statuses, n_groups sums to |distinct V2 hashes| and
    n_docs to |V2|; every V1 group is stable or displaced (new_group
    counts only hashes absent from V1)."""
    from pyspark.sql import functions as F2

    from smfg_datawarehouse_spark import queries as qmod

    d = tmp_path_factory.mktemp("prop_x156")
    rows = [
        (i, f"text {i % 13}", "en", "s0", 10) for i in range(60)
    ] + [(i, f"text {i % 7}", "en", "s1", 10) for i in range(60, 90)]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    df.coalesce(1).write.mode("overwrite").parquet(str(d / "documents.parquet"))
    out = qmod.all_queries()["x156_crossversion_dedup_stability"](
        spark, str(d)
    ).collect()
    n_groups = sum(r["n_groups"] for r in out)
    n_docs = sum(r["n_docs"] for r in out)
    exp_groups = df.select(F2.md5("text")).distinct().count()
    assert n_groups == exp_groups
    assert n_docs == len(rows)
    v1_hashes = (
        df.where(F2.col("doc_id") % 10 != 7).select(F2.md5("text")).distinct().count()
    )
    by = {r["status"]: r for r in out}
    assert by.get("new_group", None) is None or (
        by["new_group"]["n_groups"] == exp_groups - v1_hashes
    )
    stable_plus_displaced = sum(
        r["n_groups"] for r in out if r["status"] in ("stable", "displaced")
    )
    assert stable_plus_displaced == v1_hashes
