"""Kafka source/sink parity (SURVEY.md §2.13).

The reference's only streaming surface is its Kafka plugin
(plugins/kafka/kafka.hpp:56-67: Publisher / Consumer /
KafkaStreamedDataset). Structured Streaming's Kafka source is the direct
analogue; this container has no Kafka broker or spark-sql-kafka jar, so the
constructors are gated: they build the correct reader/writer configuration
and fail with a clear message if the connector is absent (the streaming
transformations themselves are broker-independent and tested via the file
source in tests/test_streaming.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def kafka_consumer(
    spark: SparkSession,
    brokers: str,
    topic: str,
    value_schema: T.StructType | str | None = None,
    starting_offsets: str = "latest",
) -> DataFrame:
    """Consumer (kafka.hpp Consumer/KafkaStreamedDataset): readStream from a
    topic; JSON values parsed to columns when ``value_schema`` given."""
    try:
        stream = (
            spark.readStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("subscribe", topic)
            .option("startingOffsets", starting_offsets)
            .load()
        )
    except Exception as e:  # pragma: no cover - jar availability
        raise RuntimeError(
            "Kafka connector unavailable (spark-sql-kafka jar not on the "
            f"classpath): {e}"
        ) from e
    if value_schema is None:
        return stream
    return stream.select(
        F.col("key").cast("string").alias("key"),
        F.from_json(F.col("value").cast("string"), value_schema).alias("v"),
        "timestamp",
    ).select("key", "v.*", "timestamp")


def kafka_publisher(
    df: DataFrame,
    brokers: str,
    topic: str,
    checkpoint_dir: str,
    key_col: str | None = None,
):
    """Publisher (kafka.hpp Publisher): writeStream rows as JSON values."""
    payload = df.select(
        *( [F.col(key_col).cast("string").alias("key")] if key_col else [] ),
        F.to_json(F.struct(*[c for c in df.columns if c != key_col])).alias("value"),
    )
    try:
        return (
            payload.writeStream.format("kafka")
            .option("kafka.bootstrap.servers", brokers)
            .option("topic", topic)
            .option("checkpointLocation", checkpoint_dir)
            .start()
        )
    except Exception as e:  # pragma: no cover - jar availability
        raise RuntimeError(
            "Kafka connector unavailable (spark-sql-kafka jar not on the "
            f"classpath): {e}"
        ) from e
