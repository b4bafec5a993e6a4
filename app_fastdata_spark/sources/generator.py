"""S1 — the synthetic event source (client LogGenerator parity).

The reference's client synthesizes click events — random source IP drawn
from a CIDR range table, uniform url/agent dim picks, 50% no-referral
sentinel, monotone µs timestamps — at a capped rate
(client/src/events/LogGenerator.java:82-96, 237-247; run.sh:157-159).

Here the generator is a PURE PROJECTION over ``spark.range(n)``: every
column is a deterministic LCG-mix of the row index, written once as an
ANSI-SQL expression string and evaluated by BOTH Spark (``F.expr``) and
the DuckDB oracle — textual parity makes the generator itself an
oracle-checked operator, something the reference (zero tests) never had.

Scale: ``spark.range`` parallelizes across executors with no input I/O
and no shuffle; 100 TB of synthetic events is just a bigger ``n`` and
more partitions. Rate-limiting (LogGenerator.java:129-131) belongs to
the streaming twin: ``streaming.pipeline.rate_events_stream``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register

N_EVENTS = 100_000
# The driver's correctness gate collect()s the registered query's full
# result; keep that fetch bounded (20k rows ≈ 2 MB) so it can't become
# the straw that breaks a memory-tight suite. Throughput tests still run
# the full N_EVENTS via the explicit ``n=`` parameter.
N_CHECK = 20_000
BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01 00:00:00 UTC in µs
STEP_US = 50  # 50 µs apart = the 20k events/s target rate (run.sh:159)

N_URLS = 49      # client/data/urls.txt line count (FIXTURES.md §1)
SENTINEL = 49    # empty-url "no referral" row id (LogGenerator.java:105-110)
N_AGENTS = 75    # client/data/agents.txt line count
N_RANGES = 256   # synthetic stand-in for the 46,053-row ips.csv range table

# One LCG draw per field, distinct salts; values stay < 2^63 (ANSI-safe in
# Spark 4 and identical to DuckDB's bigint %). A second multiplicative step
# decorrelates the low bits used by the small moduli.
def _draw(salt: int) -> str:
    return (
        f"(((id * 2654435761 + {salt}) % 4294967296) * 48271) % 2147483647"
    )


# CIDR-range pick (LogGenerator.java:92-96): range k covers
# [k*2^24 + 2^16, k*2^24 + 2^17); src = start + offset within the range.
_COLS: dict[str, str] = {
    # uint32 IP kept as bigint (the reference stores int32 with Java signed
    # wraparound, Utils.java:25-42; unsigned-as-long avoids the sign games)
    "src": (
        f"({_draw(11)} % {N_RANGES}) * 16777216 + 65536"
        f" + {_draw(13)} % 65536"
    ),
    "dest": f"cast({_draw(17)} % {N_URLS} as int)",
    "method": "'GET'",
    "ts": f"__TS_FN__({BASE_TS_US} + id * {STEP_US})",
    "size": f"{_draw(19)} % 2147483648",
    "referral": (
        f"cast(case when {_draw(23)} % 2 = 0 then {SENTINEL}"
        f" else {_draw(29)} % {N_URLS} end as int)"
    ),
    "agent": f"cast({_draw(31)} % {N_AGENTS} as int)",
}


def gen_events(spark: SparkSession, sf_dir: str, n: int = N_EVENTS) -> DataFrame:
    """Reference-native events relation, synthesized scale-out.

    `sf_dir` is unused (the source IS the generator); kept for the
    driver's uniform (spark, sf_dir) query signature.
    """
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    cols = [
        F.expr(expr.replace("__TS_FN__", "timestamp_micros")).alias(name)
        for name, expr in _COLS.items()
    ]
    return spark.range(n).select(F.col("id").alias("event_id"), *cols)


def gen_events_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-gate twin of :func:`gen_events` over a bounded window."""
    return gen_events(spark, sf_dir, n=N_CHECK)


register(
    "gen_events",
    sql="SELECT id AS event_id, "
    + ", ".join(
        f"{expr.replace('__TS_FN__', 'make_timestamp')} AS {name}"
        for name, expr in _COLS.items()
    )
    + f" FROM range(0, {N_CHECK}) t(id)",
)(gen_events_check)
