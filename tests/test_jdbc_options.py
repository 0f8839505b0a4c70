"""JDBC option-builder contract (no DB in this environment — S1's
partitioned-read configuration is what's unit-testable)."""

from __future__ import annotations

import pytest

from smfg_datawarehouse_spark.sources.jdbc import jdbc_reader_options


def test_partitioned_table_read_options():
    opts = jdbc_reader_options(
        "jdbc:mysql://host/db",
        "financialForms.guarantee_accounts",
        is_query=False,
        partition_column="account_id",
        lower_bound=0,
        upper_bound=10_000_000,
        num_partitions=32,
    )
    assert opts["dbtable"] == "financialForms.guarantee_accounts"
    assert opts["partitionColumn"] == "account_id"
    assert (opts["lowerBound"], opts["upperBound"]) == ("0", "10000000")
    assert opts["numPartitions"] == "32"
    assert opts["fetchsize"] == "100000"  # the reference's chunk_size analogue


def test_compiled_query_read():
    q = "SELECT mli_code AS Partner_Code FROM financialForms.guarantee_accounts"
    opts = jdbc_reader_options("jdbc:mysql://host/db", q)
    assert opts["query"] == q
    assert "dbtable" not in opts


def test_query_with_partition_column_rejected():
    with pytest.raises(ValueError, match="cannot combine"):
        jdbc_reader_options(
            "jdbc:mysql://host/db",
            "SELECT 1",
            partition_column="id",
            lower_bound=0,
            upper_bound=10,
        )


def test_bounds_required_with_partition_column():
    with pytest.raises(ValueError, match="requires lower_bound"):
        jdbc_reader_options(
            "jdbc:mysql://host/db",
            "t",
            is_query=False,
            partition_column="id",
        )
