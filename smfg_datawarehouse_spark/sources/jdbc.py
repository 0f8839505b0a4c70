"""Partitioned JDBC source — the Spark replacement for the reference's
manual chunked extraction.

The reference streams a MySQL cursor in 100k-row chunks single-threaded
(``staging_data_extraction.py:83-106``, chunk loop at :92). Spark's JDBC
source replaces that with *parallel* range-partitioned reads: N concurrent
connections each scanning a bounded slice — same bounded-memory property,
N× the throughput, and pushdown of the compiled projection/predicate into
the remote query.

Tested end-to-end against a REAL JDBC database: Spark bundles Apache
Derby (embedded, pure-Java), so ``tests/test_jdbc_derby_roundtrip.py``
exercises partitioned reads, query-mode pushdown, and the write→extract
round trip through an actual ``java.sql.DriverManager`` connection — the
same code path a MySQL/Postgres URL takes on a production cluster
(plus `tests/test_integration_gates.py` for a user-supplied external URL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_reader_options(
    url: str,
    query_or_table: str,
    *,
    is_query: bool = True,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = 8,
    fetch_size: int = 100_000,
    user: str | None = None,
    password: str | None = None,
) -> dict[str, str]:
    """Build Spark JDBC options. ``fetch_size`` keeps the per-connection
    cursor bounded (the chunk_size analogue, reference default 100,000).

    Range partitioning requires column+bounds; without them the read is a
    single partition (equivalent to the reference's serial loop) — callers
    should always supply bounds for big tables.
    """
    opts: dict[str, str] = {"url": url, "fetchsize": str(fetch_size)}
    opts["query" if is_query else "dbtable"] = query_or_table
    if partition_column is not None:
        if is_query:
            raise ValueError(
                "Spark JDBC cannot combine 'query' with partitionColumn; "
                "pass is_query=False with a dbtable/subquery alias"
            )
        if lower_bound is None or upper_bound is None:
            raise ValueError("partition_column requires lower_bound and upper_bound")
        opts.update(
            partitionColumn=partition_column,
            lowerBound=str(lower_bound),
            upperBound=str(upper_bound),
            numPartitions=str(num_partitions),
        )
    if user is not None:
        opts["user"] = user
    if password is not None:
        opts["password"] = password
    return opts


def read_jdbc(spark: SparkSession, options: dict[str, str]) -> DataFrame:
    reader = spark.read.format("jdbc")
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load()
