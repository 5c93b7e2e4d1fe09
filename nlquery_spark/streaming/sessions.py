"""Built-in session windows on streams (`F.session_window`).

Complements streaming/stateful.py's custom applyInPandasWithState
sessionizers: when the per-session output is a plain aggregate (count /
sum / min / max), the BUILT-IN session window is the right tool — the
state merging (sessions spanning micro-batches, out-of-order events
extending or bridging existing sessions) happens in the JVM state
store with codegen'd aggregates, no Python in the loop. Reach for the
custom operators only when per-session logic can't be expressed as an
aggregate (e.g. stateful.py's running per-session value splits).

Semantics (probed, pinned by tests/test_streaming.py): two events are
in the same session iff next_ts <= prev_ts + gap (INCLUSIVE at exactly
the gap), and a window's end is last_event_ts + gap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def session_window_stats(
    events: DataFrame,
    gap: str = "30 minutes",
    user_col: str = "user_id",
    ts_col: str = "ts",
    watermark: str | None = None,
) -> DataFrame:
    """Per-user session windows with event counts.

    Works on both batch and streaming DataFrames (the session_window
    expression is master-agnostic — the tests pin stream == batch).
    Pass ``watermark`` for append/update-mode streaming sinks so state
    for closed sessions is evicted; with a complete-mode sink (or in
    batch) leave it None.

    Scale: state is keyed by (user, session) — the shuffle is one
    exchange on the session-window key, and at 100 TB the watermark is
    what bounds state size (sessions older than the watermark are
    finalized and dropped); without it complete mode holds every
    session, which is only for bounded replays/tests.
    """
    if watermark is not None:
        events = events.withWatermark(ts_col, watermark)
    return (
        events.groupBy(
            F.session_window(F.col(ts_col), gap).alias("session_window"),
            F.col(user_col),
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            F.col(user_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )
