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
    """ST2 as a custom stateful operator over a STREAMING events frame."""
    return (
        events.select("user_id", "event_type", "ts")
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
