"""Custom stateful streaming operator via applyInPandasWithState.

Running per-predicate statistics over the extracted-triples stream: each
micro-batch updates per-key state (total mentions, distinct-ish subject
count via a bounded set, max score) and emits the updated row. This is
the `applyInPandasWithState` pattern the engine uses wherever built-in
streaming aggregations can't express the state (e.g. bounded
top-K/sketches per key at CC scale).
"""

from __future__ import annotations

from typing import Any, Iterable, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("pred", StringType(), False),
        StructField("n_mentions", LongType(), False),
        StructField("n_subjects_bounded", LongType(), False),
        StructField("max_score", DoubleType(), False),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("n_mentions", LongType(), False),
        StructField("subjects_csv", StringType(), False),  # bounded sample
        StructField("max_score", DoubleType(), False),
    ]
)

MAX_TRACKED_SUBJECTS = 1000


def _update(
    key: Tuple[Any, ...], pdfs: Iterable[pd.DataFrame], state: GroupState
):
    if state.exists:
        n, subjects_csv, max_score = state.get
        subjects = set(subjects_csv.split("\x00")) if subjects_csv else set()
    else:
        n, subjects, max_score = 0, set(), 0.0
    for pdf in pdfs:
        n += len(pdf)
        if len(subjects) < MAX_TRACKED_SUBJECTS:
            for s in pdf["subj"]:
                subjects.add(s)
                if len(subjects) >= MAX_TRACKED_SUBJECTS:
                    break
        if len(pdf):
            max_score = max(max_score, float(pdf["score"].max()))
    state.update((n, "\x00".join(sorted(subjects)), max_score))
    yield pd.DataFrame(
        {
            "pred": [key[0]],
            "n_mentions": [n],
            "n_subjects_bounded": [len(subjects)],
            "max_score": [max_score],
        }
    )


def streaming_pred_stats(triples_stream: DataFrame) -> DataFrame:
    """triples stream -> running per-predicate stats (update mode)."""
    return triples_stream.groupBy("pred").applyInPandasWithState(
        _update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# ------------------------------------------------ stateful sessionize --

SESSION_OUTPUT_SCHEMA = StructType(
    [
        StructField("user_id", LongType(), False),
        StructField("session_id", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("session_start", StringType(), False),
        StructField("session_end", StringType(), False),
        StructField("sum_value", DoubleType(), False),
    ]
)

SESSION_STATE_SCHEMA = StructType(
    [
        StructField("session_id", LongType(), False),
        StructField("last_us", LongType(), False),
        StructField("start_us", LongType(), False),
        StructField("n_events", LongType(), False),
        StructField("sum_cents", LongType(), False),
    ]
)


def _fmt_us(us: int) -> str:
    import datetime

    return datetime.datetime.utcfromtimestamp(us / 1_000_000).strftime(
        "%Y-%m-%d %H:%M:%S"
    ) + f".{us % 1_000_000:06d}"


def _sessionize_update(key, pdfs, state: GroupState, gap_sec: int = 1800):
    """Cross-batch sessionization state machine for one user: continue
    the open session or split on inactivity gaps. Values are summed as
    integer cents so incremental updates equal the batch decimal sum
    exactly. Emits an update row for every session touched in the batch
    (update-mode semantics: the final row per (user, session) is the
    one with the largest n_events)."""
    user_id = int(key[0])
    if state.exists:
        sid, last_us, start_us, n, cents = state.get
    else:
        sid, last_us, start_us, n, cents = 0, None, None, 0, 0
    out = []

    def emit():
        out.append(
            (user_id, sid, n, _fmt_us(start_us), _fmt_us(last_us), cents / 100.0)
        )

    for pdf in pdfs:
        if not len(pdf):
            continue
        pdf = pdf.sort_values(["ts", "event_id"])
        col = pdf["ts"]
        # tz-aware event time (timestamp_ltz) arrives as datetime64[ns, tz];
        # normalize exactly like the buffered variant so both sessionizers
        # accept the same input types
        if getattr(col.dtype, "tz", None) is not None:
            col = col.dt.tz_convert("UTC").dt.tz_localize(None)
        ts_us = (col.astype("datetime64[us]").astype("int64")).tolist()
        vals = [int(round(float(v) * 100)) for v in pdf["value"]]
        for t_us, cv in zip(ts_us, vals):
            if last_us is None:
                sid, start_us, n, cents = 1, t_us, 1, cv
            elif t_us - last_us > gap_sec * 1_000_000:
                emit()  # close previous session at its last event
                sid, start_us, n, cents = sid + 1, t_us, 1, cv
            else:
                n += 1
                cents += cv
            last_us = t_us
    if last_us is not None:
        emit()  # current (still-open) session's latest snapshot
        state.update((sid, last_us, start_us, n, cents))
    yield pd.DataFrame(
        out,
        columns=[
            "user_id",
            "session_id",
            "n_events",
            "session_start",
            "session_end",
            "sum_value",
        ],
    )


def streaming_sessionize(events_stream: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Streaming analog of the batch 30-min-gap sessionization
    (__spark_entry__._events_sessionize): custom per-key state via
    applyInPandasWithState. Assumes event-time-ordered replay per key
    across micro-batches (file source sorted by ts); a production
    deployment would buffer out-of-order events behind a watermark
    before this operator. The sink is update-mode: downstream keeps the
    row with max n_events per (user_id, session_id)."""
    return events_stream.groupBy("user_id").applyInPandasWithState(
        lambda key, pdfs, state: _sessionize_update(key, pdfs, state, gap_sec),
        outputStructType=SESSION_OUTPUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


# -------------------------------- watermark-buffered sessionize --------

BUFFERED_STATE_SCHEMA = StructType(
    [
        StructField("ts_csv", StringType(), False),     # buffered event times (us)
        StructField("cents_csv", StringType(), False),  # matching values (cents)
        StructField("next_sid", LongType(), False),     # id of the next session
    ]
)


def _split_sessions(ts_us, cents, gap_us):
    """Sorted events -> list of sessions [(start,end,n,cents)]."""
    sessions = []
    cur = None
    for t, c in zip(ts_us, cents):
        if cur is None or t - cur[1] > gap_us:
            if cur is not None:
                sessions.append(cur)
            cur = [t, t, 1, c]
        else:
            cur[1] = t
            cur[2] += 1
            cur[3] += c
        # events arrive sorted here
    if cur is not None:
        sessions.append(cur)
    return sessions


def _buffered_update(key, pdfs, state: GroupState, gap_sec: int = 1800):
    """Out-of-order-tolerant sessionization: buffer events in state and
    emit a session only once the WATERMARK has passed its end + gap —
    after that point no late event (within the watermark contract) can
    extend or split it, so emission is append-mode final."""
    user_id = int(key[0])
    gap_us = gap_sec * 1_000_000
    if state.exists:
        ts_csv, cents_csv, next_sid = state.get
        buf_ts = [int(x) for x in ts_csv.split(",") if x]
        buf_c = [int(x) for x in cents_csv.split(",") if x]
    else:
        buf_ts, buf_c, next_sid = [], [], 1
    for pdf in pdfs:
        if not len(pdf):
            continue
        col = pdf["ts"]
        if getattr(col.dtype, "tz", None) is not None:
            col = col.dt.tz_convert("UTC").dt.tz_localize(None)
        ts_us = col.astype("datetime64[us]").astype("int64").tolist()
        vals = [int(round(float(v) * 100)) for v in pdf["value"]]
        buf_ts.extend(ts_us)
        buf_c.extend(vals)
    order = sorted(range(len(buf_ts)), key=lambda i: buf_ts[i])
    buf_ts = [buf_ts[i] for i in order]
    buf_c = [buf_c[i] for i in order]

    wm_us = state.getCurrentWatermarkMs() * 1000
    sessions = _split_sessions(buf_ts, buf_c, gap_us)
    out = []
    closed_until = None
    for s_start, s_end, n, cents in sessions:
        if s_end + gap_us < wm_us:  # FINAL: nothing in-watermark can touch it
            out.append(
                (user_id, next_sid, n, _fmt_us(s_start), _fmt_us(s_end), cents / 100.0)
            )
            next_sid += 1
            closed_until = s_end
        else:
            break
    if closed_until is not None:
        keep = [i for i, t in enumerate(buf_ts) if t > closed_until]
        buf_ts = [buf_ts[i] for i in keep]
        buf_c = [buf_c[i] for i in keep]
    if buf_ts:
        state.update(
            (
                ",".join(str(t) for t in buf_ts),
                ",".join(str(c) for c in buf_c),
                next_sid,
            )
        )
        # wake up when the watermark can close the oldest open session
        # (must be strictly beyond the current watermark)
        first_end = _split_sessions(buf_ts, buf_c, gap_us)[0][1]
        wake_ms = max(first_end // 1000 + gap_sec * 1000 + 1, wm_us // 1000 + 1)
        state.setTimeoutTimestamp(wake_ms)
    else:
        state.remove()
    yield pd.DataFrame(
        out,
        columns=[
            "user_id", "session_id", "n_events",
            "session_start", "session_end", "sum_value",
        ],
    )


def streaming_sessionize_buffered(
    events_stream: DataFrame, gap_sec: int = 1800, watermark_delay: str = "2 hours"
) -> DataFrame:
    """Out-of-order-tolerant streaming sessionization: events buffer in
    per-user state behind a watermark and sessions emit APPEND-mode,
    exactly once, when the watermark guarantees no late event can still
    extend them (event-time timeouts re-invoke idle keys so sessions
    close without new data). The ordered-replay variant
    (streaming_sessionize) trades this robustness for update-mode
    latency; this one is the production shape for crawler streams where
    micro-batches interleave users arbitrarily."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import TimestampNTZType

    if isinstance(events_stream.schema["ts"].dataType, TimestampNTZType):
        # watermarks require TIMESTAMP (LTZ); NTZ event time is
        # interpreted in the (UTC-pinned) session zone
        events_stream = events_stream.withColumn(
            "ts", F.col("ts").cast("timestamp_ltz")
        )
    return (
        events_stream.withWatermark("ts", watermark_delay)
        .groupBy("user_id")
        .applyInPandasWithState(
            lambda key, pdfs, state: _buffered_update(key, pdfs, state, gap_sec),
            outputStructType=SESSION_OUTPUT_SCHEMA,
            stateStructType=BUFFERED_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )
