"""Streaming-path tests: availableNow windowed counts (q25 machinery)
and the applyInPandasWithState sessionizer."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from cloud_native_medical_data_etl_pipeline_spark.sources.events_io import read_events
from cloud_native_medical_data_etl_pipeline_spark.streaming import events as SE
from cloud_native_medical_data_etl_pipeline_spark.streaming import sessions as SS


def test_hourly_counts_available_now_matches_batch(spark):
    sf_dir = "/root/testdata/sf0.001"
    streamed = SE.hourly_counts_available_now(
        spark, f"{sf_dir}/events.parquet"
    )
    batch = (
        read_events(spark, f"{sf_dir}/events.parquet")
        .groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "total_value")
    )
    assert streamed.count() == batch.count()
    assert streamed.exceptAll(batch).count() == 0


def _write_events(spark, tmpdir, rows):
    df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_id long")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmpdir))


def test_streaming_sessionize_emits_closed_sessions(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def m(minutes):
        return t0 + dt.timedelta(minutes=minutes)

    rows = [
        (1, m(0), 1),
        (1, m(10), 2),
        (1, m(60), 3),   # closes session 1 (2 events), opens session 2
        (2, m(0), 4),    # single open session, stays in state
    ]
    src = tmp_path / "events_in"
    _write_events(spark, src, rows)

    stream = (
        spark.readStream.schema("user_id long, ts timestamp, event_id long")
        .parquet(str(src))
    )
    sessions = SS.streaming_sessionize(stream, gap_minutes=30)
    q = (
        sessions.writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_sink_test")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    out = {
        (r["user_id"],): r
        for r in spark.table("sess_sink_test").collect()
    }
    # only user 1's in-batch-closed session is emitted; user 2's open
    # session remains in the (now discarded) state store
    assert list(out) == [(1,)]
    s = out[(1,)]
    assert s["n_events"] == 2
    assert s["session_start"] == m(0)
    assert s["session_end"] == m(10)


def test_sessions_available_now_equals_batch(spark):
    """The sentinel-drained stateful sessionizer must equal batch
    gap-and-island sessionization row for row: in-batch closes come
    from append mode, trailing sessions from the watermark jump firing
    every event-time timeout in the final no-data micro-batch."""
    from cloud_native_medical_data_etl_pipeline_spark.operators import (
        sessions as BS,
    )

    path = "/root/testdata/sf0.001/events.parquet"
    got = sorted(
        tuple(r)
        for r in SS.sessions_available_now(spark, path, gap_minutes=30).collect()
    )
    ev = read_events(spark, path).select("user_id", "ts", "event_id")
    want = sorted(
        tuple(r)
        for r in BS.session_stats(ev, gap_minutes=30)
        .select(
            "user_id",
            F.unix_micros("session_start").alias("start_us"),
            F.unix_micros("session_end").alias("end_us"),
            "n_events",
        )
        .collect()
    )
    assert got == want
    assert len(got) > 0


def test_streaming_dedup_collapses_injected_duplicates(spark):
    """deduped_daily_counts_available_now doubles every source row
    in-flight; the watermarked dedup must collapse the stream back to
    exactly one row per event_id."""
    from cloud_native_medical_data_etl_pipeline_spark.streaming import events as SE

    path = "/root/testdata/sf0.001/events.parquet"
    out = SE.deduped_daily_counts_available_now(spark, path)
    total = out.agg({"n_events": "sum"}).collect()[0][0]
    n_ids = (
        spark.read.parquet(path).select("event_id").distinct().count()
    )
    assert total == n_ids


def test_stream_from_empty_directory_starts(spark, tmp_path):
    """A stream may be started before any producer has written a file;
    the schema probe must fall back to EVENTS_SCHEMA, not die."""
    src = tmp_path / "empty_events"
    src.mkdir()
    stream = SE.read_event_stream(spark, str(src))
    q = (
        SE.hourly_counts(stream)
        .writeStream.outputMode("complete")
        .format("memory")
        .queryName("empty_dir_sink")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    assert spark.table("empty_dir_sink").count() == 0


def test_stream_static_enrich_matches_batch(spark):
    from pyspark.sql import functions as F

    from cloud_native_medical_data_etl_pipeline_spark.streaming import events as SE

    sf = "/root/testdata/sf0.001"
    dim = spark.read.parquet(f"{sf}/customer.parquet").select(
        F.col("c_custkey").alias("user_id"),
        F.col("c_mktsegment").alias("segment"),
    )
    streamed = SE.segment_enriched_daily_available_now(
        spark, f"{sf}/events.parquet", dim
    )
    # read_events, not a raw parquet read: the events table has shipped
    # as both micros and nanos ts encodings (events_io normalizes)
    from cloud_native_medical_data_etl_pipeline_spark.sources.events_io import read_events

    ev = read_events(spark, f"{sf}/events.parquet")
    batch = (
        ev.join(dim, "user_id")
        .groupBy("segment", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
    )
    a = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert a == b and len(a) > 0


def test_stream_stream_join_matches_batch(spark):
    from pyspark.sql import functions as F

    from cloud_native_medical_data_etl_pipeline_spark.streaming import events as SE

    sf = "/root/testdata/sf0.001"
    streamed = SE.click_purchase_attribution_available_now(
        spark, f"{sf}/events.parquet", gap_minutes=30
    )
    from cloud_native_medical_data_etl_pipeline_spark.sources.events_io import read_events

    ev = read_events(spark, f"{sf}/events.parquet")
    c = ev.where(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"), F.col("ts").alias("click_ts")
    )
    p = ev.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
    )
    batch = c.join(
        p,
        (F.col("user_id") == F.col("pu"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (F.col("purchase_ts") <= F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")),
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
    a = sorted(tuple(r) for r in streamed.collect())
    b = sorted(tuple(r) for r in batch.collect())
    assert a == b and len(a) > 0


def test_stream_to_lake_upsert_exactly_once(spark, tmp_path):
    from pyspark.sql import functions as F

    from cloud_native_medical_data_etl_pipeline_spark.sources import lake
    from cloud_native_medical_data_etl_pipeline_spark.streaming import events as SE

    sf = "/root/testdata/sf0.001"
    base = str(tmp_path / "lake")
    ck1 = str(tmp_path / "ck1")

    SE.stream_to_lake_upsert(spark, f"{sf}/events.parquet", base, ck1)
    from cloud_native_medical_data_etl_pipeline_spark.sources.events_io import read_events

    ev = read_events(spark, f"{sf}/events.parquet")
    n_src = ev.count()
    stored = spark.read.parquet(base)
    assert stored.count() == n_src

    # replay with a FRESH checkpoint (simulates a full redelivery):
    # the keyed upsert must keep the lake at one row per event_id
    ck2 = str(tmp_path / "ck2")
    SE.stream_to_lake_upsert(spark, f"{sf}/events.parquet", base, ck2)
    stored2 = spark.read.parquet(base)
    assert stored2.count() == n_src
    assert stored2.select("event_id").dropDuplicates().count() == n_src


def test_stream_to_lake_upsert_quarantines_null_ts(spark, tmp_path):
    import datetime as dt

    from pyspark.sql import functions as F

    from cloud_native_medical_data_etl_pipeline_spark.streaming import events as SE

    src = str(tmp_path / "src")
    rows = [
        (1, dt.datetime(2024, 1, 5, 10), 1, "view", 1.0, "{}"),
        (2, None, 2, "click", 2.0, "{}"),  # poison row: null ts
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).write.parquet(src)
    base, ck = str(tmp_path / "lake"), str(tmp_path / "ck")
    SE.stream_to_lake_upsert(spark, src, base, ck)
    stored = spark.read.parquet(base)
    assert stored.count() == 2  # the null-ts row is kept, not dropped
    # partition cols are part of the lake layout (read back as ints)
    days = {
        tuple(str(x) for x in (r["year"], r["month"], r["day"]))
        for r in stored.select("year", "month", "day").collect()
    }
    assert ("9999", "12", "31") in days


def test_stream_dedup_ingest_gates_near_dups(spark, tmp_path):
    """End-to-end ingest composite: batch 1 seeds the corpus; batch 2
    carries an exact redelivery, a near-dup of stored content, and a
    novel doc — only the novel doc is appended. A full replay of
    batch 2 appends nothing (exactly-once via key + content guards)."""
    from cloud_native_medical_data_etl_pipeline_spark.streaming import ingest as SI

    corpus = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "spark query engines shuffle data between executors for joins"),
            (3, "the quick brown fox jumps over the lazy dog near the river bank"),
        ],
        "doc_id long, text string",
    )
    n1 = SI.ingest_batch(b1, corpus)
    assert n1 == 2  # 3 collapses into 1 (in-batch exact dedup)

    b2 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),  # key replay
            (10, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of stored 1
            (11, "a completely novel document about watermark semantics in streams"),
        ],
        "doc_id long, text string",
    )
    n2 = SI.ingest_batch(b2, corpus)
    assert n2 == 1
    stored = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert stored == {1, 2, 11}

    # full redelivery of batch 2: both guards make it a no-op
    assert SI.ingest_batch(b2, corpus) == 0
    assert spark.read.parquet(corpus).count() == 3


def test_stream_dedup_ingest_available_now_drain(spark, tmp_path):
    """The streaming wrapper drains a parquet directory through
    ingest_batch with a checkpoint; a second drain over the same
    checkpoint processes nothing new."""
    from cloud_native_medical_data_etl_pipeline_spark.streaming import ingest as SI

    src = str(tmp_path / "in")
    corpus = str(tmp_path / "corpus")
    ck = str(tmp_path / "ck")
    spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "alpha beta gamma delta epsilon zeta eta iota"),  # near-dup of 1
            (3, "entirely different words live in this document body"),
        ],
        "doc_id long, text string",
    ).write.parquet(src)

    SI.stream_dedup_ingest(spark, src, corpus, ck)
    stored = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert stored == {1, 3}

    # same checkpoint: nothing new to process, corpus unchanged
    SI.stream_dedup_ingest(spark, src, corpus, ck)
    assert spark.read.parquet(corpus).count() == 2


def test_streaming_zscore_matches_python_replay(spark):
    """The stateful monitor's single-drain output must equal a pure
    Python Welford replay of the (ts, event_id)-sorted stream —
    pre-update judging, min-points warm-up, rounded z."""
    import math

    from cloud_native_medical_data_etl_pipeline_spark.sources.events_io import (
        read_events,
    )
    from cloud_native_medical_data_etl_pipeline_spark.streaming import anomaly as SA

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_id"], r["event_type"]): r["z"]
        for r in SA.zscore_flags_available_now(
            spark, f"{sf}/events.parquet", z_thresh=2.0, min_points=10
        ).collect()
    }

    rows = (
        read_events(spark, f"{sf}/events.parquet")
        .select("event_id", "ts", "event_type", "value")
        .collect()
    )
    by_type: dict[str, list] = {}
    for r in rows:
        by_type.setdefault(r["event_type"], []).append(
            (int(r["ts"].timestamp() * 1_000_000), r["event_id"], r["value"])
        )
    want = {}
    for et, evs in by_type.items():
        evs.sort(key=lambda t: (t[0], t[1]))
        n, mean, m2 = 0, 0.0, 0.0
        for _ts, eid, x in evs:
            if x is None:
                continue
            if n >= 10:
                var = m2 / (n - 1) if n > 1 else 0.0
                sd = math.sqrt(var) if var > 0 else 0.0
                if sd > 0:
                    z = round((x - mean) / sd, 4)
                    if abs(z) > 2.0:
                        want[(eid, et)] = z
            n += 1
            d = x - mean
            mean += d / n
            m2 += d * (x - mean)
    assert len(got) > 0
    assert got == want


def test_streaming_zscore_planted_spike(spark, tmp_path):
    import datetime as dt

    from cloud_native_medical_data_etl_pipeline_spark.streaming import anomaly as SA

    src = str(tmp_path / "ev")
    rows = [
        (i, dt.datetime(2024, 1, 1, 0, i), "g", 10.0 + (i % 3))
        for i in range(40)
    ]
    rows.append((99, dt.datetime(2024, 1, 1, 0, 50), "g", 500.0))
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    ).write.parquet(src)
    out = SA.zscore_flags_available_now(spark, src, z_thresh=3.0, min_points=20)
    flags = out.collect()
    assert [r["event_id"] for r in flags] == [99]
    assert flags[0]["z"] > 3.0


def test_ingest_signature_index_maintained_and_reused(spark, tmp_path):
    """The persisted signature index at <corpus>_sigs tracks the corpus
    (placeholders included, so row counts match), and the probe path
    reads it instead of re-hashing the corpus."""
    from cloud_native_medical_data_etl_pipeline_spark.streaming import ingest as SI

    corpus = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog near the river bank"),
            (2, "hi"),  # sub-ngram -> PADDED sig row (not a placeholder)
        ],
        "doc_id long, text string",
    )
    assert SI.ingest_batch(b1, corpus) == 2
    sigs = spark.read.parquet(corpus + "_sigs")
    assert sigs.count() == spark.read.parquet(corpus).count() == 2
    ph = {r["k"]: len(r["sh"]) for r in sigs.collect()}
    # both docs carry REAL signatures: the short one is pad-shingled so
    # the content guard covers it too
    assert ph[1] > 0 and ph[2] == 1

    # near-dup of stored 1 must be gated THROUGH the index
    b2 = spark.createDataFrame(
        [(10, "the quick brown fox jumps over the lazy dog near the river bend")],
        "doc_id long, text string",
    )
    assert SI.ingest_batch(b2, corpus) == 0
    assert spark.read.parquet(corpus + "_sigs").count() == 2

    # exact redelivery of the SHORT doc under a new key: previously
    # bypassed the content guard entirely (no shingles); the padded
    # signature makes it collide at jaccard 1.0 and be dropped, while
    # DIFFERENT short content is admitted
    b3 = spark.createDataFrame(
        [(11, "hi"), (12, "yo")], "doc_id long, text string"
    )
    assert SI.ingest_batch(b3, corpus) == 1
    stored = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
    assert stored == {1, 2, 12}


def test_ingest_signature_index_self_heals(spark, tmp_path):
    """Bootstrap (pre-index corpus) and crash recovery (corpus rows
    unsigned) both resolve via the per-batch heal: missing keys get
    signed before the probe, so near-dups of unsigned content are
    still rejected."""
    import shutil

    from cloud_native_medical_data_etl_pipeline_spark.streaming import ingest as SI

    corpus = str(tmp_path / "corpus")
    b1 = spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog near the river bank")],
        "doc_id long, text string",
    )
    assert SI.ingest_batch(b1, corpus) == 1
    shutil.rmtree(corpus + "_sigs")  # simulate a pre-index corpus

    b2 = spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog near the river bend"),
            (11, "entirely novel content concerning checkpoint recovery paths"),
        ],
        "doc_id long, text string",
    )
    assert SI.ingest_batch(b2, corpus) == 1  # near-dup 10 rejected via healed index
    assert {r["doc_id"] for r in spark.read.parquet(corpus).collect()} == {1, 11}
    # heal rebuilt + batch appended: index complete again
    assert spark.read.parquet(corpus + "_sigs").count() == 2


def test_multi_batch_drain_equals_sequential_ingest(spark, tmp_path):
    """A 2-micro-batch drain (maxFilesPerTrigger=1) through the
    persisted signature index must produce the same corpus as calling
    ingest_batch sequentially on the same file splits — cross-batch
    near-dup gating flows through the index, not batch co-residence."""
    from cloud_native_medical_data_etl_pipeline_spark.streaming import ingest as SI

    f1 = [
        (1, "the quick brown fox jumps over the lazy dog near the river bank"),
        (2, "spark query engines shuffle data between executors for joins"),
    ]
    f2 = [
        (10, "the quick brown fox jumps over the lazy dog near the river bend"),  # near-dup of 1
        (11, "a completely novel document about watermark semantics in streams"),
    ]
    src = tmp_path / "in"
    src.mkdir()
    schema = "doc_id long, text string"
    # one parquet FILE per batch, named so file order matches ingest order
    spark.createDataFrame(f1, schema).coalesce(1).write.parquet(str(src / "a"))
    spark.createDataFrame(f2, schema).coalesce(1).write.parquet(str(src / "b"))
    import glob as _glob
    import shutil as _shutil

    for sub in ("a", "b"):
        part = _glob.glob(str(src / sub / "part-*.parquet"))[0]
        _shutil.move(part, str(src / f"{sub}.parquet"))
        _shutil.rmtree(str(src / sub))

    stream_corpus = str(tmp_path / "stream_corpus")
    SI.stream_dedup_ingest(
        spark, str(src), stream_corpus, str(tmp_path / "ck"),
        max_files_per_trigger=1,
    )

    seq_corpus = str(tmp_path / "seq_corpus")
    SI.ingest_batch(spark.createDataFrame(f1, schema), seq_corpus)
    SI.ingest_batch(spark.createDataFrame(f2, schema), seq_corpus)

    got = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(stream_corpus).collect()
    )
    want = sorted(
        (r["doc_id"], r["text"]) for r in spark.read.parquet(seq_corpus).collect()
    )
    assert got == want
    assert {d for d, _ in got} == {1, 2, 11}  # 10 gated cross-batch
    # index tracked both appends
    assert spark.read.parquet(stream_corpus + "_sigs").count() == 3


def test_sessions_null_ts_rows_are_skipped(spark, tmp_path):
    """A NULL-ts event must not crash the sessionizer (NaT.value is
    int64-min: negative timeout or Timestamp overflow)."""
    from cloud_native_medical_data_etl_pipeline_spark.streaming import sessions as SS

    path = str(tmp_path / "events")
    rows = [(1, 1, 1000), (2, 1, 1300), (3, 1, None)]
    spark.createDataFrame(rows, "event_id long, user_id long, s long").select(
        "event_id", "user_id", F.timestamp_seconds("s").alias("ts")
    ).write.parquet(path)
    out = SS.sessions_available_now(spark, path, gap_minutes=1)
    ses = out.collect()
    assert len(ses) == 2  # 1000 and 1300 split by the 60s gap
    assert all(r["n_events"] == 1 for r in ses)


def test_sessions_empty_table_returns_empty_frame(spark, tmp_path):
    from cloud_native_medical_data_etl_pipeline_spark.streaming import sessions as SS

    path = str(tmp_path / "events")
    spark.createDataFrame(
        [], "event_id long, user_id long, ts timestamp"
    ).write.parquet(path)
    assert SS.sessions_available_now(spark, path).collect() == []


def test_parse_duration_accepts_spark_interval_aliases():
    from cloud_native_medical_data_etl_pipeline_spark.streaming.sessions import (
        _parse_duration_us,
    )

    assert _parse_duration_us("1 day") == 86400 * 1_000_000
    assert _parse_duration_us("2 Hours") == 7200 * 1_000_000
    assert _parse_duration_us("30 min") == 1800 * 1_000_000
    assert _parse_duration_us("10 secs") == 10 * 1_000_000
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _parse_duration_us("3 fortnights")


def test_run_available_now_multi_file_backfill_drops_nothing(spark, tmp_path):
    """The r8 single-batch fix, pinned on its hazard case: a 3-file
    backfill where files 2 and 3 hold events HOURS OLDER than file 1's
    max timestamp.  Under the old default (maxFilesPerTrigger=10 but
    >10 files, or any multi-batch split), the watermark advances
    between batches and those rows are silently dropped as late;
    reading everything in ONE batch (max_files_per_trigger=None) the
    watermark only moves after all input is in, so the early-hour
    window must count every file's rows."""
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    base = dt.datetime(2024, 1, 1, 10, 30)
    late = dt.datetime(2024, 1, 1, 23, 0)

    def rows(ids, ts):
        return [(i, ts, 1, "click", 1.0, None) for i in ids]

    src = tmp_path / "in"
    src.mkdir()
    files = [
        rows([1, 2], base) + rows([3], late),  # file 1 pushes max ts to 23:00
        rows([4, 5], base),                    # would be "late" vs 21:00 watermark
        rows([6], base),
    ]
    import glob as _glob
    import shutil as _shutil

    for n, chunk in enumerate(files):
        d = src / f"stage{n}"
        spark.createDataFrame(chunk, schema).coalesce(1).write.parquet(str(d))
        part = _glob.glob(str(d / "part-*.parquet"))[0]
        _shutil.move(part, str(src / f"{n}.parquet"))
        _shutil.rmtree(str(d))

    out = str(tmp_path / "out")
    SE.run_available_now(
        spark, str(src), out, str(tmp_path / "ck")
    )
    got = {
        (r["window_start"], r["event_type"]): r["n"]
        for r in spark.read.parquet(out).collect()
    }
    # the 10:00 window finalizes (23:00 max ts - 2 h horizon > 11:00)
    # and must hold ALL FIVE early rows, across all three files
    assert got[(dt.datetime(2024, 1, 1, 10, 0), "click")] == 5


def test_stream_to_lake_upsert_oracle_roundtrip(spark, tmp_path):
    """The r13 registration candidate (q25c), proven locally first —
    the last unit-only streaming op's DuckDB-oracle shape: drain
    events through stream_to_lake_upsert TWICE (the second run is a
    full redelivery with a fresh checkpoint), then aggregate the lake
    per (year, month, day, event_type).  The oracle aggregates the
    SOURCE with the same day derivation: they hash-match iff (a) the
    sink landed every row exactly once, (b) the day partitioning
    matches the sentinel-coalesced date rule, and (c) the full replay
    was a perfect no-op — duplicated rows would double n/total_value.
    """
    import duckdb

    from cloud_native_medical_data_etl_pipeline_spark.streaming import events as SE

    sf = "/root/testdata/sf0.001"
    base, ck1, ck2 = (
        str(tmp_path / "lake"),
        str(tmp_path / "ck1"),
        str(tmp_path / "ck2"),
    )
    SE.stream_to_lake_upsert(spark, f"{sf}/events.parquet", base, ck1)
    SE.stream_to_lake_upsert(spark, f"{sf}/events.parquet", base, ck2)
    got = sorted(
        (int(r["year"]), int(r["month"]), int(r["day"]), r["event_type"],
         r["n"], r["total_value"])
        for r in spark.read.parquet(base)
        .groupBy("year", "month", "day", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .collect()
    )
    want = sorted(
        (int(y), int(m), int(d), et, n, tv)
        for y, m, d, et, n, tv in duckdb.sql(
            f"""
            SELECT CAST(COALESCE(EXTRACT(year FROM ts), 9999) AS INT) AS year,
                   CAST(COALESCE(EXTRACT(month FROM ts), 12) AS INT) AS month,
                   CAST(COALESCE(EXTRACT(day FROM ts), 31) AS INT) AS day,
                   event_type,
                   COUNT(*) AS n,
                   ROUND(SUM(value), 4) AS total_value
            FROM '{sf}/events.parquet'
            GROUP BY 1, 2, 3, 4
            """
        ).fetchall()
    )
    assert got == want and len(got) > 0
