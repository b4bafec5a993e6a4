"""Table loading with explicit schemas (never inferred — SURVEY.md §1.3).

The driver testdata is a TPC-H-ish star schema plus a generic ``events``
stream table, ``documents`` and ``embeddings`` (TESTDATA.md). Reference
columns map onto ``events`` per FIXTURES.md §3:
src→user_id, dest→event_type, ts→ts, size→value.
"""

from __future__ import annotations

import functools

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = [
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

def _events_schema(ts_type: T.DataType) -> T.StructType:
    return T.StructType(
        [
            T.StructField("event_id", T.LongType(), False),
            T.StructField("ts", ts_type, False),
            T.StructField("user_id", T.LongType(), False),
            T.StructField("event_type", T.StringType(), False),
            T.StructField("value", T.DoubleType(), False),
            T.StructField("props", T.StringType(), True),
        ]
    )


# Raw read schema: ts as a plain long. Works for BOTH physical layouts the
# driver has shipped — TIMESTAMP(NANOS) (read as long ns via the
# nanosAsLong legacy conf) and TIMESTAMP(MICROS)/int64 (the parquet
# reader hands back the raw µs int64) — the unit is discovered from the
# file footer by events_ts_unit, never assumed.
_EVENTS_RAW = _events_schema(T.LongType())
_EVENTS_TS = _events_schema(T.TimestampType())


def _probe_target(path: str) -> str | None:
    """Resolve the actual footer to probe: the file itself, or — for a
    Spark-written directory layout, including partitioned day=... trees —
    any *.parquet underneath (recursive). None when nothing exists at the
    path OR the directory holds no parquet yet (a streaming source dir
    before its first drop — the genuinely-absent case callers may
    default on)."""
    import os as _os

    if _os.path.isfile(path):
        return path
    if _os.path.isdir(path):
        parts = _list_parts(path)
        if parts:
            return parts[0]
        return None
    return None


def _list_parts(dir_path: str) -> list[str]:
    """Sorted recursive *.parquet listing under a directory — the ONE
    part-file discovery rule shared by the footer probe and the cache
    stamp (divergent copies would let the stamp disagree with the probe
    target)."""
    import glob
    import os as _os

    return sorted(
        glob.glob(_os.path.join(dir_path, "**", "*.parquet"), recursive=True)
    )


def file_stamp(path: str) -> tuple:
    """Cache-invalidation key shared by every per-path cache (ts-unit
    probe, centroid broadcasts, serving stores): an in-place rewrite OR
    append changes the stamp, so caches re-derive instead of serving
    stale state. For a single file: (1, mtime_ns, size). For a directory
    layout the stamp covers EVERY part file (count, max mtime, total
    size) — stamping only the lexicographically-first part would miss an
    appended part whose random name sorts later. (0, 0, 0) when nothing
    exists (the subsequent load fails anyway)."""
    import os as _os

    if _os.path.isdir(path):
        parts = _list_parts(path)
        mt, size = 0, 0
        for p in parts:
            try:
                st = _os.stat(p)
            except OSError:
                continue
            mt = max(mt, st.st_mtime_ns)
            size += st.st_size
        return (len(parts), mt, size)
    try:
        st = _os.stat(path)
        return (1, st.st_mtime_ns, st.st_size)
    except OSError:
        return (0, 0, 0)


@functools.lru_cache(maxsize=None)
def _ts_unit_cached(target: str, stamp: tuple) -> str:
    # `stamp` (mtime_ns, size) is part of the key purely to invalidate on
    # in-place rewrite (tools/tests that regenerate testdata mid-app).
    import pyarrow as pa
    import pyarrow.parquet as pq  # raises loudly if pyarrow is absent

    t = pq.read_schema(target).field("ts").type
    # match on (kind, unit), NOT the rendered string: Spark writes
    # isAdjustedToUTC=true, which pyarrow renders "timestamp[us,
    # tz=UTC]" — a string compare against "timestamp[us]" misrouted
    # every Spark-written µs directory to the ns path (ts ÷ 1000 →
    # 1970-era timestamps; caught by the merged-sessions stream parity
    # test in round 7).
    if pa.types.is_timestamp(t) and t.unit == "us":
        return "us"
    # pyarrow reports BOTH int64-nanos and legacy INT96 timestamps as
    # timestamp[ns]; only int64-nanos needs the raw-long read path
    # (nanosAsLong) — Spark reads INT96 natively as TimestampType, and
    # forcing bigint on it fails with PARQUET_COLUMN_DATA_TYPE_MISMATCH.
    pf = pq.ParquetFile(target)
    idx = pf.schema_arrow.get_field_index("ts")
    if pf.metadata.num_row_groups > 0:
        phys = pf.metadata.row_group(0).column(idx).physical_type
        if phys == "INT96":
            return "us"
    return "ns"


def events_ts_unit(path: str) -> str:
    """'us' when the events parquet stores ts as a real µs timestamp
    (driver layout as of round 4), 'ns' for the int64/TIMESTAMP(NANOS)
    nanosecond layout (rounds 1-3). Footer-only probe (no data read),
    cached per (path, mtime, size) so an in-place rewrite re-probes.

    A file that EXISTS but cannot be probed (unreadable footer, pyarrow
    missing) raises — silently defaulting would divide µs by 1000 and
    produce 1970-era timestamps downstream. The 'ns' default is reserved
    for genuinely absent files (e.g. a streaming source dir created
    before its first drop; rounds 1-3 shipped ns)."""
    import os as _os

    target = _probe_target(path)
    if target is None:
        return "ns"
    try:
        st = _os.stat(target)
        return _ts_unit_cached(target, (st.st_mtime_ns, st.st_size))
    except Exception as e:
        raise RuntimeError(
            f"events_ts_unit: {target!r} exists but its parquet footer "
            f"could not be probed ({e}); refusing to guess the timestamp "
            "unit — a wrong guess silently corrupts every ts downstream."
        ) from e


def convert_raw_events(df: DataFrame, unit: str) -> DataFrame:
    """Raw long-ts events frame → µs TimestampType ``ts``. Streaming-safe
    (pure projection; the unit comes from a driver-side footer probe of
    the source dir's events.parquet)."""
    if unit == "us":
        return df.withColumn("ts", F.timestamp_micros(F.col("ts")))
    return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))


# Explicit schemas (mirrors the reference's compiled-DDL catalog discipline,
# db/ddl.sql:62-73 via run.sh:102-107 — schemas are declared, not inferred).
SCHEMAS: dict[str, T.StructType] = {
    # raw long-ts form for streaming file sources (convert with
    # convert_raw_events); batch load_table picks the layout-native
    # schema itself.
    "events": _EVENTS_RAW,
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType(), False),
            T.StructField("text", T.StringType(), False),
            T.StructField("lang", T.StringType(), True),
            T.StructField("source", T.StringType(), True),
            T.StructField("n_chars", T.LongType(), True),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType(), False),
            T.StructField("embedding", T.ArrayType(T.FloatType()), False),
            T.StructField("label", T.IntegerType(), True),
        ]
    ),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # The driver supplies its own SparkSession; timestamp semantics (naive
    # parquet values vs the DuckDB oracle) are only correct under UTC, so
    # RE-pin on every load (idempotent — conf.set to the current value is
    # a no-op): a harness that flips the session tz between query builds
    # would otherwise shift string→timestamp literal casts (e.g. TPC-H
    # date filters) relative to the oracle. Instant-based predicates
    # (recency, ts_ns prunes) are additionally tz-independent by
    # construction.
    if spark.conf.get("spark.sql.session.timeZone", None) != "UTC":
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    # Session-cache the loaded FRAME per (app, dir, table, file stamp):
    # every spark.read.schema(...).parquet(path) call pays a driver-side
    # file listing + analysis round trip (~0.15-0.25 s measured at r13,
    # and minutes-scale listings on real multi-million-file tables —
    # guide §6 "file listing"). A DataFrame is an immutable plan, not
    # data: caching the definition re-scans parquet on every action, so
    # results always come from the files; the stamp key re-derives after
    # any in-place rewrite or append (same invalidation contract as
    # every other per-path cache in cache.py).
    from .cache import session_get, stamp_key

    return session_get(
        f"load_table-{name}",
        stamp_key(spark, sf_dir, name),
        lambda: _load_table_frame(spark, sf_dir, name),
    )


def _load_table_frame(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    path = f"{sf_dir}/{name}.parquet"
    if name == "events":
        # ts_ns (long nanos) is kept next to ts in BOTH layouts so every
        # consumer sees one schema. Pushdown differs by layout: under µs
        # the native TimestampType ts is the raw scan column (timestamp
        # predicates push down; ts_ns is derived), under ns the raw long
        # IS ts_ns (long predicates push down; ts is derived). Recency
        # filters apply both forms so one always reaches the scan
        # (serving.events_in_window).
        if events_ts_unit(path) == "us":
            df = spark.read.schema(_EVENTS_TS).parquet(path)
            return df.withColumn("ts_ns", F.unix_micros("ts") * 1000)
        df = spark.read.schema(_EVENTS_RAW).parquet(path)
        return df.withColumn("ts_ns", F.col("ts")).withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    if name in SCHEMAS:
        return spark.read.schema(SCHEMAS[name]).parquet(path)
    return spark.read.parquet(path)


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


@functools.lru_cache(maxsize=None)
def _pq_num_rows_cached(path: str, stamp: tuple) -> int | None:
    import os as _os

    import pyarrow.parquet as pq

    if _os.path.isdir(path):
        parts = _list_parts(path)
        if not parts:
            return None
        return sum(pq.read_metadata(p).num_rows for p in parts)
    if _os.path.isfile(path):
        return pq.read_metadata(path).num_rows
    return None


def parquet_num_rows(path: str) -> int | None:
    """Total row count from the parquet FOOTER(s) — no Spark job, no data
    read; cached per (path, stamp) like the ts-unit probe. None when the
    path is absent or a footer is unreadable (callers fall back to a
    count() action). Counts RAW rows: a caller whose frame filters rows
    (e.g. nonzero-vector guards) gets an upper bound — fine for
    threshold seams like GEMM_MIN_ROWS, wrong for exact cardinality."""
    try:
        return _pq_num_rows_cached(path, file_stamp(path))
    except Exception:
        return None


# Spark's FileSourceScan packing defaults (spark.sql.files.*) — used as
# fallbacks only; the live session's values are read per call (a session
# that overrides them would otherwise get a silently wrong estimate and
# the widen guard would fire/skip incorrectly).
_SCAN_MAX_SPLIT = 128 * 1024 * 1024  # maxPartitionBytes default
_SCAN_OPEN_COST = 4 * 1024 * 1024    # openCostInBytes default

# Every suffix Spark's JavaUtils.byteStringAs accepts — an unknown
# suffix falling back to the default would silently mis-size the scan
# estimate, the exact failure the conf-read exists to prevent.
_BYTE_SUFFIX = {
    "": 1, "b": 1,
    "k": 1 << 10, "kb": 1 << 10,
    "m": 1 << 20, "mb": 1 << 20,
    "g": 1 << 30, "gb": 1 << 30,
    "t": 1 << 40, "tb": 1 << 40,
    "p": 1 << 50, "pb": 1 << 50,
}


def _parse_bytes(s: str | None, default: int) -> int:
    """Parse a Spark byte-size conf value ("134217728", "128MB", "4m",
    "134217728b") to an int; `default` on absent/unparsable."""
    if not s:
        return default
    txt = str(s).strip().lower()
    i = len(txt)
    while i > 0 and not txt[: i].isdigit():
        i -= 1
    num, suffix = txt[:i], txt[i:].strip()
    if not num or suffix not in _BYTE_SUFFIX:
        return default
    return int(num) * _BYTE_SUFFIX[suffix]


def _scan_packing_confs(spark: SparkSession) -> tuple[int, int]:
    """(maxPartitionBytes, openCostInBytes) from the live session."""
    return (
        _parse_bytes(
            spark.conf.get("spark.sql.files.maxPartitionBytes", None),
            _SCAN_MAX_SPLIT,
        ),
        _parse_bytes(
            spark.conf.get("spark.sql.files.openCostInBytes", None),
            _SCAN_OPEN_COST,
        ),
    )


@functools.lru_cache(maxsize=None)
def _est_scan_partitions(
    path: str,
    stamp: tuple,
    parallelism: int,
    max_split_conf: int = _SCAN_MAX_SPLIT,
    open_cost_conf: int = _SCAN_OPEN_COST,
) -> int:
    """Estimate of the scan partition count Spark will produce for
    `path`, from the file listing alone (mirrors FilePartition packing:
    maxSplitBytes = min(maxPartitionBytes, max(openCost,
    total/parallelism)), splits bin-packed to maxSplitBytes). `stamp`
    keys the cache so an in-place rewrite re-derives."""
    import os as _os

    if _os.path.isdir(path):
        files = _list_parts(path)
    elif _os.path.isfile(path):
        files = [path]
    else:
        files = []
    total = 0
    for p in files:
        try:
            total += _os.stat(p).st_size + open_cost_conf
        except OSError:
            continue
    if total == 0:
        return 1
    max_split = min(
        max_split_conf, max(open_cost_conf, total // max(parallelism, 1))
    )
    return max(1, -(-total // max_split))


_WIDEN_BYTES_PER_PART = 128 * 1024


def _input_bytes(path: str) -> int:
    """Total bytes under a parquet file/dir path (0 when absent)."""
    import os as _os

    if _os.path.isdir(path):
        total = 0
        for p in _list_parts(path):
            try:
                total += _os.stat(p).st_size
            except OSError:
                continue
        return total
    try:
        return _os.stat(path).st_size
    except OSError:
        return 0


# Forced-broadcast gate (r13 verdict Next #2): an explicit F.broadcast
# hint overrides autoBroadcastJoinThreshold entirely, so a hint on a
# frame whose cardinality scales with the FACT data (a filtered `part`,
# a pre-reduced `orders` slice) stops being an optimization at scale and
# becomes a guaranteed driver/executor OOM. Gate every such hint on the
# parquet FOOTER row count of the source table that bounds the frame's
# cardinality (filter/project/fk-join never add rows): under the
# threshold the hint keeps its planning value (estimates after filters
# are unreliable, §3.1); at or above it the hint is withheld and
# Catalyst/AQE picks the strategy from ACTUAL sizes — a still-small
# build side still broadcasts via autoBroadcastJoinThreshold, a huge one
# degrades to a shuffle join instead of an OOM. Same env-overridable
# seam pattern as GEMM_MIN_ROWS; every driver testdata SF sits far
# below the default, so gated plans are unchanged where the plan tests
# pin them (the seam tests flip the env and assert the hint disappears).
BROADCAST_MAX_ROWS = 8_000_000
_BROADCAST_MAX_ROWS_ENV = "SPARK_GRAFT_BROADCAST_MAX_ROWS"


def broadcast_max_rows() -> int:
    """The gate threshold, read per call so tests (and a deployment
    that knows its driver memory) can override via env. ~8M source
    rows bounds the worst hinted build at a few hundred MB framed —
    §3.1's 'usually fine' ceiling — far under the 8 GB / 512M-row hard
    broadcast cap. NOTE: memoized_build plans do not re-derive on an
    env flip mid-session (the stamp key carries no env) — flip it
    before the session builds the plan, as the seam tests do via the
    undecorated `__wrapped__` builder."""
    import os as _os

    raw = _os.environ.get(_BROADCAST_MAX_ROWS_ENV)
    if raw:
        try:
            return int(raw)
        except ValueError:
            pass
    return BROADCAST_MAX_ROWS


def maybe_broadcast(df: DataFrame, sf_dir: str, table: str) -> DataFrame:
    """``F.broadcast(df)`` only when ``table``'s footer row count — an
    upper bound on ``df``'s rows, which must derive from ``table`` by
    filter/projection/aggregation/fk-join — is under the gate; otherwise
    ``df`` unchanged (AQE decides). An unreadable footer fails CLOSED
    (no forced hint): at the scale where footers go missing the hint is
    the risky choice, and Catalyst still broadcasts provably-small
    sides on its own."""
    n = parquet_num_rows(f"{sf_dir}/{table}.parquet")
    if n is not None and n < broadcast_max_rows():
        return F.broadcast(df)
    return df


def widen_small_scan(df: DataFrame, path: str | None = None) -> DataFrame:
    """Re-split a scan whose file layout gives fewer partitions than the
    cluster has slots (the tiny-testdata artifact: one 600 KB parquet →
    one partition → a single-threaded map stage in front of every
    token-level operator). A round-robin repartition to the default
    parallelism costs one small shuffle and buys slots× map parallelism.
    At real scale a corpus scan has thousands of splits, the guard is
    false, and the DataFrame passes through UNTOUCHED — no added
    exchange in the 100 TB plan.

    Pass `path` (the parquet file/dir backing df's scan) so the guard
    reads a CACHED file-listing estimate; without it the guard falls
    back to df.rdd.getNumPartitions(), which forces a physical-plan
    translation per call — measurable planning cost on hot paths, and
    pure waste at real scale where the guard is false."""
    sc = df.sparkSession.sparkContext
    slots = sc.defaultParallelism
    if path is not None:
        max_split, open_cost = _scan_packing_confs(df.sparkSession)
        n = _est_scan_partitions(
            path, file_stamp(path), slots, max_split, open_cost
        )
    else:
        n = df.rdd.getNumPartitions()
    if n * 2 <= slots:
        # Size the re-split from the INPUT BYTES, not the slot count
        # (guide §2: make partitioning scale-adaptive, not a constant
        # tuned for the local core count). Flat `repartition(slots)` put
        # a 600 KB corpus into 32 partitions, and the Python stages this
        # guard feeds then paid 32× the per-task Arrow/worker setup for
        # ~150 rows each — measured 0.75 s/stage at 32 partitions vs
        # 0.34-0.39 s at 4-16 for the same 5000-doc UDF. ~128 KB per
        # partition keeps each task meaningfully sized at any input
        # size, and the slot clamp preserves the original upper bound;
        # at real scale the n*2<=slots guard is false and the scan
        # passes through untouched, exactly as before.
        size = _input_bytes(path) if path is not None else None
        if size:
            target = max(2, min(slots, -(-size // _WIDEN_BYTES_PER_PART)))
        else:
            target = slots
        return df.repartition(target)
    return df
