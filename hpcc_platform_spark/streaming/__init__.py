"""Structured Streaming parity (SURVEY.md §2.13).

The reference has NO streaming engine — only a Kafka pub/sub plugin
(plugins/kafka/kafka.hpp:56-67) and workflow CRON/WAIT events. Structured
Streaming is therefore a superset surface here: Kafka-shaped source/sink
helpers plus windowed/stateful aggregation utilities.
"""

from hpcc_platform_spark.streaming.windows import (
    sessionized_stream,
    tumbling_counts,
)

__all__ = ["sessionized_stream", "tumbling_counts"]
