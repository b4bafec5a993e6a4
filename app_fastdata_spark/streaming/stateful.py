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


# --- Stateful backward as-of join (last purchase at-or-before) --------------
# state per user: µs of the max event ts seen (the peer-group boundary),
# µs of the latest purchase, cumulative purchase count, and the
# event_ids/types AT the boundary ts — the rows that must be RE-EMITTED
# (update-mode upsert) if a later batch lands more peers at the same
# timestamp with a purchase among them. Peer arrays are bounded by
# events-per-(user, microsecond), not by the stream.
ASOF_STATE_SCHEMA = (
    "boundary_us long, last_us long, n long,"
    " peer_ids array<long>, peer_types array<string>"
)

ASOF_OUTPUT_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("last_purchase_ts", T.TimestampType()),
        T.StructField("purchases_so_far", T.LongType()),
    ]
)


def _asof_backward():
    def fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        (user_id,) = key
        if state.exists:
            boundary_us, last_us, n_prev, peer_ids, peer_types = state.get
            peer_ids = list(peer_ids or [])
            peer_types = list(peer_types or [])
        else:
            boundary_us, last_us, n_prev = None, None, 0
            peer_ids, peer_types = [], []

        pdf = pd.concat(list(pdfs), ignore_index=True)
        pdf = pdf.sort_values(["ts", "event_id"], kind="mergesort")
        is_p = (pdf["event_type"] == "purchase").to_numpy()
        ts = pdf["ts"].reset_index(drop=True)
        # RANGE-frame peer semantics: every row at timestamp t sees ALL
        # purchases with ts' <= t INCLUDING its own ts-peers, so fold
        # cumulative sums/maxima to per-peer-group maxima (transform
        # over the ts groups), exactly the batch window's default frame.
        cum_n = pd.Series(is_p.cumsum(), index=ts.index)
        peer_n = cum_n.groupby(ts, sort=False).transform("max") + n_prev
        pts = ts.where(pd.Series(is_p, index=ts.index))
        # cummax(skipna=True) leaves NaT AT the NaT positions (it only
        # refuses to reset the running max) — ffill propagates the last
        # purchase forward to the non-purchase rows
        cum_pts = pts.cummax().ffill()
        peer_pts = cum_pts.groupby(ts, sort=False).transform("max")
        if last_us is not None:
            prior = pd.Timestamp(last_us * 1000)  # µs → ns
            peer_pts = peer_pts.fillna(prior).clip(lower=prior)
        out_ids = pdf["event_id"].astype("int64").to_numpy()
        out_types = pdf["event_type"].to_numpy()
        out_pts = peer_pts.to_numpy()
        out_n = peer_n.astype("int64").to_numpy()

        # Re-emission (the split-peer-group case the property fuzzer
        # found): if this batch lands a PURCHASE at exactly the stored
        # boundary timestamp, the boundary peers emitted in earlier
        # batches under-report — upsert them with the continuation
        # group's corrected values. Purchases_so_far is monotone per
        # event, so downstream latest-wins == max(purchases_so_far).
        re_ids: list = []
        re_types: list = []
        re_pts = re_n = None
        if peer_ids and boundary_us is not None:
            b_ts = pd.Timestamp(boundary_us * 1000)
            at_b = (ts == b_ts).to_numpy()
            if (at_b & is_p).any():
                re_ids = peer_ids
                re_types = peer_types
                grp = at_b.nonzero()[0][0]
                re_pts = out_pts[grp]
                re_n = int(out_n[grp])

        # fold the batch into the state
        new_n = int(n_prev + is_p.sum())
        if is_p.any():
            batch_last_us = (
                int(ts[pd.Series(is_p, index=ts.index)].max().value) // 1_000
            )
            last_us = (
                batch_last_us if last_us is None else max(last_us, batch_last_us)
            )
        new_boundary_ts = ts.iloc[-1]
        new_boundary_us = int(new_boundary_ts.value) // 1_000
        at_new = (ts == new_boundary_ts).to_numpy()
        if boundary_us is not None and new_boundary_us == boundary_us:
            peer_ids = peer_ids + [int(i) for i in out_ids[at_new]]
            peer_types = peer_types + [str(t) for t in out_types[at_new]]
        else:
            peer_ids = [int(i) for i in out_ids[at_new]]
            peer_types = [str(t) for t in out_types[at_new]]
        state.update((new_boundary_us, last_us, new_n, peer_ids, peer_types))

        out = pd.DataFrame(
            {
                "event_id": out_ids,
                "user_id": pd.Series([user_id] * len(pdf), dtype="int64"),
                "event_type": out_types,
                "last_purchase_ts": out_pts,
                "purchases_so_far": out_n,
            }
        )
        if re_ids:
            out = pd.concat(
                [
                    pd.DataFrame(
                        {
                            "event_id": pd.Series(re_ids, dtype="int64"),
                            "user_id": pd.Series(
                                [user_id] * len(re_ids), dtype="int64"
                            ),
                            "event_type": re_types,
                            "last_purchase_ts": pd.Series(
                                [re_pts] * len(re_ids),
                                dtype="datetime64[ns]",
                            ),
                            "purchases_so_far": pd.Series(
                                [re_n] * len(re_ids), dtype="int64"
                            ),
                        }
                    ),
                    out,
                ],
                ignore_index=True,
            )
        yield out

    return fn


def stateful_asof_backward_stream(events: DataFrame) -> DataFrame:
    """The backward as-of join (operators.joins.asof_last_purchase) as a
    custom stateful STREAMING operator — the at-ingest form: for every
    event, the most recent purchase (ts' <= ts, ts-peers included) by
    the same user plus the running purchase count, maintained as THREE
    longs plus two bounded peer arrays of state per live user
    (ASOF_STATE_SCHEMA — the peer arrays are the essence of the
    ts-peer re-emission fix; applyInPandasWithState, Arrow-batched,
    one shuffle on user_id, no driver state). The forward direction is
    inherently non-streaming — "next purchase at-or-after" is unknowable
    until an unbounded future arrives — which is exactly why only the
    backward form gets an ingest twin; the batch operator serves both.

    Cross-batch contract: EXACT under time-ordered arrival per user
    (the ingest/harvest file order), INCLUDING a ts-peer group split
    across batches — the case the property fuzzer found: a view at t in
    batch 1 whose purchase peer at the same t arrives in batch 2. The
    state keeps the boundary peer group's ids/types, and a late peer
    purchase triggers an update-mode RE-EMISSION of the corrected rows;
    downstream treats rows as upserts keyed by event_id, latest-wins
    (purchases_so_far is monotone per event, so max() disambiguates
    without a batch id). State is 3 longs + the per-(user, microsecond)
    peer arrays — bounded by simultaneous events, not by the stream.
    Within a batch any order is fine (the op sorts). NULL-ts events are
    excluded on both engines — an as-of position without a timestamp is
    undefined (same rule as the batch twin) — and NULL-user events are
    excluded HERE (a streaming shuffle key must be concrete, and a NULL
    in an int64 Arrow batch coerces to float64, corrupting ids >= 2^53):
    the registered oracle carries the same `user_id IS NOT NULL`
    predicate, mirroring the debounce twin's non-NULL-key ingest
    contract."""
    clean = events.filter(
        "ts IS NOT NULL AND user_id IS NOT NULL"
    ).select("event_id", "user_id", "event_type", "ts")
    return clean.groupBy("user_id").applyInPandasWithState(
        _asof_backward(),
        outputStructType=ASOF_OUTPUT_SCHEMA,
        stateStructType=ASOF_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def asof_last_purchase_stateful(spark, sf_dir: str) -> DataFrame:
    """Driver wrapper: run the stateful backward as-of end-to-end
    (file-source stream, AvailableNow, memory sink) under the batch
    asof_last_purchase oracle restricted to non-NULL users — a full
    value-hash parity check on the streaming operator."""
    from .pipeline import events_stream, run_to_memory

    _RUN_SEQ[0] += 1
    out = run_to_memory(
        stateful_asof_backward_stream(events_stream(spark, sf_dir)),
        f"stateful_asof_{_RUN_SEQ[0]}",
        output_mode="update",
    )
    return out.orderBy("event_id")


register(
    "asof_last_purchase_stateful",
    sql="""
    SELECT event_id, user_id, event_type,
           max(CASE WHEN event_type = 'purchase' THEN ts END)
             OVER (PARTITION BY user_id ORDER BY ts) AS last_purchase_ts,
           count(CASE WHEN event_type = 'purchase' THEN ts END)
             OVER (PARTITION BY user_id ORDER BY ts) AS purchases_so_far
    FROM events
    WHERE ts IS NOT NULL AND user_id IS NOT NULL
    """,
)(asof_last_purchase_stateful)
