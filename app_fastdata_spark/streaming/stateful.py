"""Custom stateful sessionization via ``applyInPandasWithState`` (ST2).

``session_window`` (pipeline.session_start_stream) covers the reference's
gap rule declaratively; this module implements the SAME semantics as a
hand-rolled stateful operator — the escape hatch the engine offers for
session logic Spark's built-ins can't express (e.g. per-session early
emission, custom merge rules). Semantics: per (src, dest), events whose
inter-arrival gap exceeds ``gap_seconds`` split sessions; each session
emits (src, dest, session_start, n_events).

Emission contract (update mode): every batch emits all sessions CLOSED in
that batch plus a snapshot of the still-open session; downstream treats
rows as upserts keyed by (src, dest, session_start). On a single-batch
run (file source default, Trigger.AvailableNow) the output is exactly the
batch ``session_aggregate`` — asserted in tests.

Scale notes: state is 3 longs per live (src, dest) pair — the same keyed
state VoltDB held in its `events_sessions` view (db/ddl.sql:103-112);
Arrow-batched transfer, one shuffle on the grouping key, no driver state.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

from ..params import SESSION_GAP_SECONDS
from ..registry import register

OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("src", T.LongType()),
        T.StructField("dest", T.StringType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
    ]
)

# state: (open_session_start_ns, last_event_ns, n_events_in_open_session)
STATE_SCHEMA = "start_ns long, last_ns long, n long"


def _sessionize(gap_seconds: int):
    gap_ns = gap_seconds * 1_000_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        src, dest = key
        if state.exists:
            start_ns, last_ns, n = state.get
        else:
            start_ns, last_ns, n = None, None, 0

        closed: list[tuple[int, int]] = []  # (session_start_ns, n_events)
        for pdf in pdfs:
            ts = pdf["ts"].astype("int64").sort_values()  # datetime64[ns] → ns
            for t in ts:
                t = int(t)
                if last_ns is not None and t - last_ns <= gap_ns:
                    last_ns, n = t, n + 1
                else:
                    if start_ns is not None:
                        closed.append((start_ns, n))
                    start_ns, last_ns, n = t, t, 1
        state.update((start_ns, last_ns, n))
        out = closed + ([(start_ns, n)] if start_ns is not None else [])
        yield pd.DataFrame(
            {
                "src": [src] * len(out),
                "dest": [dest] * len(out),
                "session_start": pd.to_datetime([s for s, _ in out], unit="ns"),
                "n_events": [c for _, c in out],
            }
        )

    return fn


def stateful_session_stream(
    events: DataFrame, gap_seconds: int = SESSION_GAP_SECONDS
) -> DataFrame:
    """ST2 as a custom stateful operator over a STREAMING events frame.
    NULL-ts events are dropped Spark-side BEFORE the Python stage (the
    batch twin's exclusion, and a NaT would astype to int64-min inside
    the sessionizer)."""
    return (
        events.select("user_id", "event_type", "ts")
        .filter(F.col("ts").isNotNull())
        .groupBy("user_id", "event_type")
        .applyInPandasWithState(
            _sessionize(gap_seconds),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


# Batch-driver wrapper: run the stateful operator end-to-end (file-source
# stream, AvailableNow, memory sink) and return the materialized sessions.
# Registered with the SAME oracle as the batch session_aggregate — a full
# value-hash check on a custom stateful streaming operator.
_RUN_SEQ = [0]


def session_aggregate_stateful(spark, sf_dir: str) -> DataFrame:
    from .pipeline import events_stream, run_to_memory

    _RUN_SEQ[0] += 1
    out = run_to_memory(
        stateful_session_stream(events_stream(spark, sf_dir)),
        f"stateful_sessions_{_RUN_SEQ[0]}",
        output_mode="update",
    )
    return out.select("src", "dest", "session_start", "n_events")


def _register() -> None:
    from ..operators.sessions import SESSION_AGGREGATE_SQL

    register("session_aggregate_stateful", sql=SESSION_AGGREGATE_SQL)(
        session_aggregate_stateful
    )


_register()


# --- Stateful debounce (near-duplicate event suppression) -----------------------
# state: microseconds of the last RAW event seen per (user_id, event_type)
DEBOUNCE_STATE_SCHEMA = "last_us long"

DEBOUNCE_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("prev_gap_s", T.DoubleType()),
    ]
)


def _debounce(gap_seconds: int):
    gap_us = gap_seconds * 1_000_000

    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        user_id, event_type = key
        last_us = state.get[0] if state.exists else None

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        keep_ids: list[int] = []
        keep_ts: list = []
        keep_gap: list = []
        for eid, ts in zip(pdf["event_id"], pdf["ts"]):
            t_us = int(ts.value) // 1_000  # pandas ns → exact µs
            gap = None if last_us is None else t_us - last_us
            if gap is None or gap > gap_us:
                keep_ids.append(int(eid))
                keep_ts.append(ts)
                # gap_us/1e6 has <=6 decimal digits exactly, so this IS
                # the batch side's round(gap_us/1e6, 6) bit-for-bit
                keep_gap.append(None if gap is None else gap / 1e6)
            last_us = t_us  # raw-event anchor, kept or not
        state.update((last_us,))
        yield pd.DataFrame(
            {
                "event_id": pd.Series(keep_ids, dtype="int64"),
                "user_id": pd.Series(
                    [user_id] * len(keep_ids), dtype="int64"
                ),
                "event_type": [event_type] * len(keep_ids),
                "ts": pd.Series(keep_ts, dtype="datetime64[ns]"),
                "prev_gap_s": pd.Series(keep_gap, dtype="float64"),
            }
        )

    return fn


def stateful_debounce_stream(events: DataFrame, gap_seconds: int) -> DataFrame:
    """Near-duplicate suppression as a custom stateful streaming operator:
    per (user_id, event_type), drop events within gap_seconds of the
    previous RAW event — the at-ingest twin of the batch
    operators.behavior.events_debounce (same gap-to-previous semantics,
    NOT keep-anchored), expressed the way an ingest pipeline would run
    it: state is ONE long per live key, Arrow-batched, one shuffle on
    the key, no watermark needed because the state never grows with the
    stream (it overwrites).

    NULL keys/ts are filtered Spark-side BEFORE the stateful op — a NULL
    in an int64 Arrow batch silently becomes float64 and corrupts ids
    >= 2^53 (the documented Arrow trap)."""
    clean = events.filter(
        "ts IS NOT NULL AND user_id IS NOT NULL AND event_type IS NOT NULL"
    ).select("event_id", "user_id", "event_type", "ts")
    return clean.groupBy("user_id", "event_type").applyInPandasWithState(
        _debounce(gap_seconds),
        outputStructType=DEBOUNCE_OUTPUT_SCHEMA,
        stateStructType=DEBOUNCE_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def events_debounce_stateful(spark, sf_dir: str) -> DataFrame:
    """Driver wrapper: run the stateful debounce end-to-end (file-source
    stream, AvailableNow, memory sink) and register it under the SAME
    DuckDB oracle as the batch events_debounce — a full value-hash
    parity check on the streaming operator."""
    from ..operators.behavior import DEBOUNCE_GAP_S
    from .pipeline import events_stream, run_to_memory

    _RUN_SEQ[0] += 1
    out = run_to_memory(
        stateful_debounce_stream(
            events_stream(spark, sf_dir), DEBOUNCE_GAP_S
        ),
        f"stateful_debounce_{_RUN_SEQ[0]}",
        output_mode="update",
    )
    return out.orderBy("event_id")


def _register_debounce() -> None:
    from ..operators.behavior import DEBOUNCE_SQL

    register("events_debounce_stateful", sql=DEBOUNCE_SQL)(
        events_debounce_stateful
    )


_register_debounce()
