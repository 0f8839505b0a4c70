"""Streaming surface — the REALTIME refresh cadence the reference declares
but never implements (``RefreshFrequency ENUM('EOD','HOURLY','REALTIME')``,
``1. Metadata Creation.sql:66``; SURVEY §2.9 T2).

Window builders are *engine-agnostic*: the same function produces the plan
for a batch DataFrame (oracle-checkable) and a streaming DataFrame
(``readStream`` + watermark + ``Trigger.AvailableNow``) — Structured
Streaming's unified semantics guarantee the results agree, and
``tests/test_streaming.py`` asserts it.
"""

from smfg_datawarehouse_spark.streaming.windows import (
    session_agg,
    sliding_agg,
    tumbling_agg,
    events_stream,
)

__all__ = ["tumbling_agg", "sliding_agg", "session_agg", "events_stream"]
