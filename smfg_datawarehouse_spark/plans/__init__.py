from smfg_datawarehouse_spark.plans.inspect import (
    formatted_plan,
    partition_filters,
    pushed_filters,
    read_schemas,
    assert_no_cartesian,
    broadcast_join_count,
    exchange_count,
    scan_count,
)

__all__ = [
    "formatted_plan",
    "partition_filters",
    "pushed_filters",
    "read_schemas",
    "assert_no_cartesian",
    "broadcast_join_count",
    "exchange_count",
    "scan_count",
]
