"""JSONL and ORC event ingest/export — the interchange formats beyond
parquet/Avro/CSV that a lake migration actually hands this engine
(reference ingests via CSV loader + client streams, run.sh:104-123 and
client/; an engine replacing it must also accept the files other
systems emit).

Scale rules baked in rather than documented-only:

- **Never infer schema on read.** `spark.read.json` without a schema
  runs a WHOLE extra pass over the data to sample types (at 100 TB that
  is a second full scan before the first real job), and inference can
  type a column differently per shard. Readers here take the explicit
  events StructType; unparseable lines land in a `_corrupt_record`
  column (PERMISSIVE) instead of failing the scan, and the caller
  decides whether to count, quarantine, or drop them.
- **Timestamps cross JSONL as ISO-8601 strings.** JSON has no timestamp
  type; the writer formats µs precision and the reader parses it back,
  so a parquet→jsonl→parquet round trip is value-exact (tested).
- **ORC is columnar like parquet** — predicate pushdown and column
  pruning work the same way through Spark's native reader; the round
  trip is schema- and value-exact (tested). DuckDB cannot read ORC, so
  cross-engine checks ride the JSONL path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

# The interchange schema: events as other systems ship them (ts as an
# ISO string — parsing is the reader's job; everything else typed).
EVENTS_JSONL_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.StringType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
        T.StructField("_corrupt_record", T.StringType()),
    ]
)

_TS_FMT = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def write_events_jsonl(events: DataFrame, path: str) -> None:
    """Export an events frame as JSON-lines, timestamps as µs-precision
    ISO strings (JSON has no timestamp type; a raw epoch long would be
    ambiguous about the unit to a non-Spark consumer)."""
    cols = [c for c in events.columns if c not in ("ts", "ts_ns")]
    events.select(
        F.date_format("ts", _TS_FMT).alias("ts"), *cols
    ).write.mode("overwrite").json(path)


def _parse_jsonl_events(raw: DataFrame) -> DataFrame:
    """Shared post-parse for both JSONL readers. try_to_timestamp, NOT
    to_timestamp: the session pins spark.sql.ansi.enabled=true, under
    which to_timestamp THROWS on an unparseable string — so one
    syntactically-valid line with a garbage `ts` (which PERMISSIVE mode
    does NOT quarantine; only JSON-syntax corruption is) would abort the
    batch scan and permanently wedge the streaming reader, violating the
    module contract above. A failed timestamp parse instead yields NULL
    ts, and the row is surfaced as a quarantine candidate by folding a
    marker into `_corrupt_record` (raw string preserved for triage)."""
    parsed = F.try_to_timestamp("ts", F.lit(_TS_FMT))
    return raw.select(
        "event_id",
        parsed.alias("ts"),
        "user_id",
        "event_type",
        "value",
        "props",
        F.coalesce(
            "_corrupt_record",
            F.when(
                F.col("ts").isNotNull() & parsed.isNull(),
                F.concat(F.lit("unparseable ts: "), F.col("ts")),
            ),
        ).alias("_corrupt_record"),
    )


def read_events_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Ingest JSON-lines events with the EXPLICIT schema (no inference
    pass) in PERMISSIVE mode: malformed lines surface as
    `_corrupt_record` rows for the caller to quarantine — a 100 TB
    ingest must never abort on one bad shard. Spark restriction: a
    query that prunes down to ONLY the corrupt-record column raises
    (the parser would have nothing to fail on) — `.cache()` the frame
    before a quarantine-only count, as the tests do."""
    raw = spark.read.schema(EVENTS_JSONL_SCHEMA).option(
        "mode", "PERMISSIVE"
    ).option("columnNameOfCorruptRecord", "_corrupt_record").json(path)
    return _parse_jsonl_events(raw)


def events_jsonl_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of `read_events_jsonl`: a checkpointed file-source
    stream over a JSONL drop directory — the shape a log shipper
    (fluentd/vector/filebeat) hands this engine. Same EXPLICIT schema
    (a streaming source cannot infer anyway), same PERMISSIVE
    quarantine column, same µs timestamp parse; every downstream
    operator of `events_stream` composes unchanged. Batch/stream
    equality is pinned by a Trigger.AvailableNow parity test."""
    raw = (
        spark.readStream.schema(EVENTS_JSONL_SCHEMA)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
    )
    return _parse_jsonl_events(raw)


def write_events_orc(events: DataFrame, path: str) -> None:
    """Columnar export via Spark's native ORC writer (zlib default) —
    same pushdown/pruning properties as parquet on read-back."""
    events.drop("ts_ns").write.mode("overwrite").orc(path)


def read_events_orc(spark: SparkSession, path: str) -> DataFrame:
    """Native ORC scan. Schema travels in the ORC footer, so no
    inference pass and no drift: the reader returns exactly what the
    writer stored."""
    return spark.read.orc(path)
