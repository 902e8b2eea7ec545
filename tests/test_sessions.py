"""Sessionization: gaps-and-islands semantics (boundary rule: an event
at EXACTLY the gap merges; strictly past it splits — the same rule as
Spark's native session_window), per-event vs per-session consistency,
and the streaming variants (session_window rollup parity + the
applyInPandasWithState custom stateful operator)."""

import datetime

from pyspark.sql import functions as F

from deezymatch_spark.operators import session_stats, sessionize

T0 = datetime.datetime(2024, 1, 1, 0, 0, 0)


def _ts(seconds):
    return T0 + datetime.timedelta(seconds=seconds)


def _events(spark):
    rows = [
        # user 1: [0, 29, 59] | gap-tie 89 merges | [150.000001 splits]
        (1, _ts(0), "a", 1.0),
        (1, _ts(29), "b", 2.0),
        (1, _ts(59), "a", 3.0),
        (1, _ts(89), "c", 4.0),            # exactly 30s after 59 -> merges
        (1, _ts(119.000001), "a", 5.0),    # 30.000001s after 89 -> splits
        # user 2: single event
        (2, _ts(10), "a", 1.0),
        # user 3: two sessions, equal-timestamp tie inside the first
        (3, _ts(0), "a", 1.0),
        (3, _ts(0), "b", 2.0),
        (3, _ts(100), "a", 3.0),
    ]
    return spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_type string, value double"
    )


def py_sessions(rows, gap_us):
    """Independent twin: per-user sorted fold over datetimes (no epoch
    conversion, so no timezone assumptions) -> list of
    (user, start_dt, end_dt, n, max_gap_us)."""
    us = datetime.timedelta(microseconds=1)
    gap = gap_us * us
    by_user = {}
    for u, t in rows:
        by_user.setdefault(u, []).append(t)
    out = []
    for u, ts in by_user.items():
        ts.sort()
        start = last = ts[0]
        n, mx = 1, 0
        for t in ts[1:]:
            if t - last > gap:
                out.append((u, start, last, n, mx))
                start, last, n, mx = t, t, 1, 0
            else:
                mx = max(mx, (t - last) // us)
                last, n = t, n + 1
        out.append((u, start, last, n, mx))
    return out


def test_sessionize_boundaries(spark):
    df = _events(spark)
    got = sessionize(df, "user_id", "ts", gap_seconds=30).collect()
    seqs = {(r.user_id, r.ts): r.session_seq for r in got}
    assert seqs[(1, _ts(0))] == 1
    assert seqs[(1, _ts(89))] == 1           # exact-gap tie merges
    assert seqs[(1, _ts(119.000001))] == 2   # past the gap splits
    assert seqs[(2, _ts(10))] == 1
    assert seqs[(3, _ts(0))] == 1 and seqs[(3, _ts(100))] == 2
    # session_start = first event of the session, for every row
    starts = {(r.user_id, r.session_seq): r.session_start for r in got}
    assert starts[(1, 1)] == _ts(0) and starts[(1, 2)] == _ts(119.000001)
    for r in got:
        assert r.session_start == starts[(r.user_id, r.session_seq)]


def test_session_stats_matches_python_twin(spark):
    df = _events(spark)
    got = sorted(
        (r.user_id, r.session_start, r.session_end, r.n_events, r.dur_us)
        for r in session_stats(
            df, "user_id", "ts", gap_seconds=30, value_col="value",
            type_col="event_type",
        ).collect()
    )
    us = datetime.timedelta(microseconds=1)
    twin = sorted(
        (u, s, e, n, (e - s) // us)
        for u, s, e, n, _ in py_sessions(
            [(r.user_id, r.ts) for r in df.collect()], 30_000_000
        )
    )
    assert got == twin


def test_sessionize_consistent_with_session_stats(spark):
    """The lag-based per-event assignment and the session_window rollup
    must carve identical sessions on the sf0.001 events table."""
    ev = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts")
    )
    gap = 600.0
    a = (
        sessionize(ev, "user_id", "ts", gap_seconds=gap)
        .groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    b = session_stats(ev, "user_id", "ts", gap_seconds=gap).select(
        "user_id", "session_start", "session_end", "n_events"
    )
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert b.count() > ev.select("user_id").distinct().count()


def test_null_timestamps_dropped_consistently(spark):
    """session_window silently drops null-ts rows (its plan inserts
    Filter isnotnull); sessionize must do the same or the operators
    disagree on corpora with missing event times."""
    rows = [(1, _ts(0)), (1, None), (1, _ts(10)), (2, None)]
    df = spark.createDataFrame(rows, "user_id long, ts timestamp")
    a = sessionize(df, "user_id", "ts", gap_seconds=30)
    assert a.count() == 2 and a.where("ts is null").count() == 0
    b = session_stats(df, "user_id", "ts", gap_seconds=30)
    assert [(r.user_id, r.n_events) for r in b.collect()] == [(1, 2)]


def test_streaming_session_stats_matches_batch(spark, tmp_path):
    import glob
    import os
    import shutil

    src = str(tmp_path / "events_in")
    os.makedirs(src)
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet").select(
        "user_id", "ts", "value"
    )
    # feed TIME-ORDERED files (a stream's arrival order ~ event order):
    # each file is one micro-batch, so the watermark advances
    # monotonically between batches and closes earlier sessions (append
    # emits them). A randomly-split feed would leap the watermark ahead
    # and legitimately drop most events as late — not what this
    # parity test is about.
    evq = ev.withColumn(
        "_us", F.unix_micros(F.col("ts").cast("timestamp"))
    )
    cuts = evq.approxQuantile("_us", [0.25, 0.5, 0.75], 0.0)
    bounds = [None, *cuts, None]
    for i in range(4):
        part = evq
        if bounds[i] is not None:
            part = part.where(F.col("_us") > bounds[i])
        if bounds[i + 1] is not None:
            part = part.where(F.col("_us") <= bounds[i + 1])
        part = part.drop("_us")
        d = str(tmp_path / f"slice{i}")
        part.coalesce(1).write.parquet(d)
        f = glob.glob(os.path.join(d, "part-*.parquet"))[0]
        shutil.copy(f, os.path.join(src, f"{i:02d}.parquet"))
    stream = spark.readStream.schema(ev.schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)

    from deezymatch_spark.streaming import streaming_session_stats

    out = streaming_session_stats(
        stream, "user_id", "ts", gap_seconds=600, watermark="1 hour",
        value_col="value",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stats")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.dur_us)
        for r in spark.sql("select * from sess_stats").collect()
    }
    expected = {
        (r.user_id, r.session_start): (r.session_end, r.n_events, r.dur_us)
        for r in session_stats(
            ev, "user_id", "ts", gap_seconds=600, value_col="value"
        ).collect()
    }
    # append emits only watermark-closed sessions; each must equal the
    # batch result exactly
    assert len(got) > 0
    for k, v in got.items():
        assert expected[k] == v


def test_streaming_user_sessions_stateful(spark, tmp_path):
    """applyInPandasWithState sessionization: gap-closed sessions emit
    with the order-dependent max_gap_us statistic; cross-batch late
    rows either extend the open session's start backwards or emit as
    their own 'late' session; the final open sessions close by
    event-time timeout once a later file advances the watermark."""
    import shutil

    from deezymatch_spark.streaming import streaming_user_sessions

    rows1 = [
        (1, _ts(0)), (1, _ts(20)), (1, _ts(45)),      # max gap 25s
        (1, _ts(200)),                                # splits (155s > 30s)
        (2, _ts(0)),
    ]
    # batch 2 (inside the 1 h watermark, so not dropped as late):
    # user 1 at 100s is >gap BEFORE its open session's 200s start ->
    # immediate single-event 'late' session; user 2 at -5s is within
    # the gap before its 0s start -> extends the session backwards
    rows2 = [(1, _ts(100)), (2, _ts(-5)), (99, _ts(100_000))]
    # far-future flusher: triggers the micro-batch whose watermark
    # (200_000 - 3_600 s) is past every user-1/2 timeout, so they FIRE
    # (watermark updates at batch boundaries, and availableNow is not
    # guaranteed a trailing no-data batch)
    rows3 = [(99, _ts(200_000))]
    src = str(tmp_path / "ev_in")
    import glob
    import os

    os.makedirs(src)
    for i, rows in enumerate((rows1, rows2, rows3)):
        d = str(tmp_path / f"f{i}")
        spark.createDataFrame(
            rows, "user_id long, ts timestamp"
        ).coalesce(1).write.parquet(d)
        f = glob.glob(os.path.join(d, "part-*.parquet"))[0]
        shutil.copy(f, os.path.join(src, f"{i:02d}.parquet"))

    stream = (
        spark.readStream.schema("user_id long, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    out = streaming_user_sessions(
        stream, "user_id", "ts", gap_seconds=30, watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("user_sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    got = {
        (r.user_id, r.session_start): (
            r.session_end, r.n_events, r.max_gap_us, r.closed_by
        )
        for r in spark.sql(
            "select * from user_sessions where user_id in (1, 2)"
        ).collect()
    }
    # user 1 session A: closed in-batch by the 200s event
    assert got[(1, _ts(0))] == (_ts(45), 3, 25_000_000, "gap")
    # user 1's late 100s row: > gap before the open 200s session
    assert got[(1, _ts(100))] == (_ts(100), 1, 0, "late")
    # user 1 session B: closed by event-time timeout after the flusher
    assert got[(1, _ts(200))] == (_ts(200), 1, 0, "timeout")
    # user 2: late -5s row extended the session backwards (gap sampled
    # against the old start), then timeout-closed
    assert got[(2, _ts(-5))] == (_ts(0), 2, 5_000_000, "timeout")
    assert len(got) == 4
