"""Kafka source/sink builders (the BASELINE.json approach names
Structured Streaming + Kafka as the export-stream transport).

The spark-sql-kafka package is external to the pyspark wheel and absent
in this container (probed — like spark-avro), and there is no broker; so
these builders construct the full reader/writer plumbing (options,
serialization to/from the events schema) and are exercised through
`kafka_available()`-gated tests. On a cluster with the package installed
they work as-is: the event payload round-trips through JSON `value`
bytes with `from_json`/`to_json` against the declared schema — the same
explicit-schema discipline as the parquet path (tables.SCHEMAS).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..tables import SCHEMAS

_KAFKA_OK: bool | None = None


def kafka_available(spark: SparkSession) -> bool:
    global _KAFKA_OK
    if _KAFKA_OK is None:
        try:
            spark.readStream.format("kafka").option(
                "kafka.bootstrap.servers", "localhost:0"
            ).option("subscribe", "probe").load()
            _KAFKA_OK = True
        except Exception as ex:  # noqa: BLE001
            _KAFKA_OK = "Failed to find data source" not in str(ex)
    return _KAFKA_OK


def events_kafka_stream(
    spark: SparkSession,
    bootstrap: str,
    topic: str,
    max_offsets_per_trigger: int | None = None,
) -> DataFrame:
    """S1-over-Kafka: subscribe → JSON value → typed events columns.
    `max_offsets_per_trigger` is the ST10 pacing knob on this source."""
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("subscribe", topic)
        .option("startingOffsets", "earliest")
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", max_offsets_per_trigger)
    raw = reader.load()
    parsed = raw.select(
        F.from_json(F.col("value").cast("string"), SCHEMAS["events"]).alias("e")
    ).select("e.*")
    return parsed.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


def kafka_export_sink(
    df: DataFrame, bootstrap: str, topic: str, checkpoint: str
):
    """S4-over-Kafka: the export stream as JSON messages keyed by src —
    per-key ordering in the topic mirrors the reference's per-partition
    export order."""
    return (
        df.select(
            F.col("src").cast("string").alias("key"),
            F.to_json(F.struct(*df.columns)).alias("value"),
        )
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .option("checkpointLocation", checkpoint)
    )
