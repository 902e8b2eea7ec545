"""Sessionization over event streams (gaps-and-islands).

The reference is a string-matching library with no event-stream surface
(SURVEY.md §2.9); these cover the user-activity side of a web-scale
pipeline — turning a clickstream/crawl-event table into per-event
session assignments and per-session rollups, the grouping every
engagement / abuse / crawl-budget analysis runs on.

Two operators, one boundary rule. Spark's native
``F.session_window`` (the batch+streaming built-in) merges an event
into the running session iff ``ts <= prev_ts + gap`` — verified
empirically: an event arriving at EXACTLY the gap still merges; the
break condition is strictly ``ts - prev_ts > gap``. Both operators
here (and the DuckDB oracle in ``__spark_entry__.py``) implement that
same rule, so the lag-based per-event assignment and the
session_window rollup agree on every boundary, including the
exact-gap tie.

Scale: both are ONE shuffle on the user key. ``sessionize`` is a
window sort within each user's rows (Spark sorts per partition after
hash-partitioning on user — no global sort); ``session_stats`` is a
partial-aggregating session_window groupBy. Neither collects, joins,
or runs Python. At 10^12 events the only knob is
``spark.sql.shuffle.partitions``; per-user row counts bound the
window state, and a pathological single hot user is a data bug, not a
plan bug (the same key would break ANY per-user analysis).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["sessionize", "session_stats"]


def _gap_us(gap_seconds: float) -> int:
    if gap_seconds <= 0:
        raise ValueError(f"gap_seconds must be > 0, got {gap_seconds}")
    return int(round(gap_seconds * 1_000_000))


def sessionize(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap_seconds: float = 1800.0,
) -> DataFrame:
    """Per-event session assignment: every input row with a non-null
    timestamp + ``session_seq`` (1-based ordinal of the session within
    the user) and ``session_start`` (the session's first event time).
    Null-``ts_col`` rows are DROPPED — the same rule the native
    ``session_window`` applies (its plan inserts ``isnotnull``), so the
    two operators always carve identical sessions.

    Gaps-and-islands as two window expressions over ONE user-key
    shuffle: ``lag(ts)`` marks rows that start a new session
    (``ts - prev > gap``, in exact integer microseconds — the same
    boundary rule as ``F.session_window``, exact-gap ties merge), and
    a running ``sum`` of the marks numbers the sessions. No join back,
    no UDF, no collect.
    """
    gap = _gap_us(gap_seconds)
    clash = {"session_seq", "session_start", "_brk"} & set(events.columns)
    if clash:
        raise ValueError(
            f"sessionize: input already has column(s) {sorted(clash)} — "
            "silently overwriting them would destroy data; rename them"
        )
    # null-timestamp rows are dropped, matching session_window exactly
    # (its plan inserts Filter isnotnull(ts)) — without this the two
    # operators would disagree on corpora with missing event times
    events = events.where(F.col(ts_col).isNotNull())
    # ordering by ts alone is enough: rows with EQUAL timestamps can
    # never break a session (diff 0 <= gap), so every emitted value is
    # invariant to how the window orders ties — no tie-breaker column,
    # no nondeterminism under retry
    w = Window.partitionBy(user_col).orderBy(ts_col)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    # parquet event times are typically TIMESTAMP_NTZ; unix_micros wants
    # TIMESTAMP — the cast lives only inside the diff (tz shift cancels)
    # so the emitted columns keep the input's type
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    new_session = (
        F.coalesce(us - F.lag(us).over(w), F.lit(gap + 1)) > F.lit(gap)
    ).cast("long")
    # session_start as a running last-break-timestamp over the SAME
    # user-key window — a min() over (user, session_seq) would add a
    # second Exchange for nothing
    return (
        events.withColumn("_brk", new_session)
        .withColumn("session_seq", F.sum("_brk").over(run))
        .withColumn(
            "session_start",
            F.last(
                F.when(F.col("_brk") == 1, F.col(ts_col)), ignorenulls=True
            ).over(run),
        )
        .drop("_brk")
    )


def session_stats(
    events: DataFrame,
    user_col: str,
    ts_col: str,
    *,
    gap_seconds: float = 1800.0,
    value_col: str | None = None,
    type_col: str | None = None,
) -> DataFrame:
    """Per-session rollup via the native ``F.session_window`` — one row
    per (user, session): ``session_start``/``session_end`` (first/last
    event), ``n_events``, ``dur_us`` (exact integer microseconds
    between first and last event; 0 for single-event sessions), plus
    ``sum_value`` (rounded to 6 dp) when ``value_col`` is given and
    ``n_types`` (distinct ``type_col`` values) when ``type_col`` is.

    The same expression works UNCHANGED on a streaming DataFrame with a
    watermark (see ``streaming/ops.py:streaming_session_stats``) —
    that unified batch/streaming surface is why this uses the built-in
    instead of re-deriving sessions from :func:`sessionize`'s output.
    """
    gap = _gap_us(gap_seconds)
    if "_w" in events.columns:
        raise ValueError(
            "session_stats: input already has a '_w' column — the "
            "session-window alias would collide with it; rename it"
        )
    aggs = [
        F.count("*").cast("long").alias("n_events"),
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        (
            F.unix_micros(F.max(ts_col).cast("timestamp"))
            - F.unix_micros(F.min(ts_col).cast("timestamp"))
        ).alias("dur_us"),
    ]
    if value_col is not None:
        aggs.append(F.round(F.sum(value_col), 6).alias("sum_value"))
    if type_col is not None:
        aggs.append(
            F.countDistinct(type_col).cast("long").alias("n_types")
        )
    return (
        events.groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), f"{gap} microseconds").alias("_w"),
        )
        .agg(*aggs)
        .drop("_w")
    )
