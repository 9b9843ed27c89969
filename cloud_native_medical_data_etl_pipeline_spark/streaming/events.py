"""Structured Streaming ingestion for the events stream.

The reference is daily-batch only (SURVEY.md §2.10); this is the
capability extension the driver's `events` table exists for: a
readStream -> watermark -> tumbling-window aggregation -> sink
pipeline whose BATCH equivalent is q14_hourly_windows, so correctness
is checked there and this module is about the streaming mechanics —
late-data handling via watermark, incremental state, availableNow
backfill.

At scale: the same code runs against Kafka by swapping the source;
state store size is bounded by (watermark horizon / window) x
distinct event_type, not by stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from cloud_native_medical_data_etl_pipeline_spark.sources.events_io import (
    stream_events,
)

from ._drain import drain_to_memory

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType(), True),
        T.StructField("ts", T.TimestampType(), True),
        T.StructField("user_id", T.LongType(), True),
        T.StructField("event_type", T.StringType(), True),
        T.StructField("value", T.DoubleType(), True),
        T.StructField("props", T.StringType(), True),
    ]
)


def read_event_stream(
    spark: SparkSession, path: str, max_files_per_trigger: int | None = 10
) -> DataFrame:
    """File-source stream over a directory of parquet event files,
    ts normalized to timestamp whichever encoding the files carry.
    EVENTS_SCHEMA is the fallback when the directory is still empty
    (stream started before any producer wrote a file)."""
    return stream_events(
        spark,
        path,
        max_files_per_trigger=max_files_per_trigger,
        fallback_schema=EVENTS_SCHEMA,
    )


def hourly_counts(
    stream: DataFrame, watermark: str = "2 hours", window: str = "1 hour"
) -> DataFrame:
    """Tumbling-window counts+sums with late-data watermark. Identical
    semantics to q14_hourly_windows once the stream is drained."""
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 4).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "total_value",
        )
    )


def hourly_counts_available_now(spark: SparkSession, path: str) -> DataFrame:
    """Run the watermarked tumbling-window aggregation as a REAL
    Structured Streaming query — readStream source, availableNow
    trigger, in-memory complete-mode sink — drain it, and return the
    result table. Batch-equivalent to q14_hourly_windows, which is what
    makes it oracle-checkable: complete mode emits every window, so
    after the drain the sink equals the batch aggregation exactly.

    stream_events probes the footer and normalizes ts to timestamp
    whichever physical encoding (micros / nanos-as-long) the files
    carry, matching the batch loader.
    """
    stream = stream_events(spark, path)
    return drain_to_memory(hourly_counts(stream), "hourly_counts_sink", "complete")


def deduped_daily_counts_available_now(spark: SparkSession, path: str) -> DataFrame:
    """Streaming exactly-once ingestion: watermarked
    ``dropDuplicatesWithinWatermark`` over the event stream, then a
    daily rollup of the deduped sink.

    Each source row is doubled in-stream (explode over two copies)
    so the dedup state provably does work — the sink must collapse the
    stream back to one row per event_id. State is keyed by event_id
    and expires at the watermark horizon, so memory is bounded by
    (duplicate-arrival window x event rate), not stream length — the
    property that makes this the 100 TB at-least-once -> exactly-once
    bridge. Append mode: dedup emits rows immediately (no window
    finalization wait), which keeps the availableNow drain equal to
    the batch DISTINCT — what makes it oracle-checkable.
    """
    stream = (
        stream_events(spark, path)
        .withColumn("__copy", F.explode(F.array(F.lit(1), F.lit(2))))
        .drop("__copy")
    )
    deduped = stream.withWatermark("ts", "2 hours").dropDuplicatesWithinWatermark(
        ["event_id"]
    )
    return (
        drain_to_memory(deduped, "dedup_events_sink", "append")
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def run_available_now(
    spark: SparkSession, input_path: str, output_path: str, checkpoint: str
) -> None:
    """Drain everything currently available (the daily-batch analog:
    Trigger.AvailableNow), write complete windows to parquet, stop."""
    # ONE batch: the default maxFilesPerTrigger=10 would advance the
    # watermark between batches of a multi-file backfill and silently
    # drop as late any event older than (max ts seen so far - horizon)
    # sitting in a later file — the hazard sessions_available_now's
    # sentinel dance exists to avoid
    agg = hourly_counts(
        read_event_stream(spark, input_path, max_files_per_trigger=None)
    )
    q = (
        agg.writeStream.outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", checkpoint)
        .format("parquet")
        .option("path", output_path)
        .start()
    )
    q.awaitTermination()


def segment_enriched_daily_available_now(
    spark: SparkSession, path: str, dim: DataFrame
) -> DataFrame:
    """Stream-STATIC enrich join: the event stream inner-joins a static
    dimension frame (user_id -> segment) and rolls up to
    (segment, day) counts + value sums, drained with an availableNow
    trigger into a complete-mode memory sink.

    The stream-static inner join is STATELESS in Structured Streaming
    (each micro-batch joins against the static side independently —
    no join state, no watermark requirement), and Catalyst broadcasts
    the dimension exactly as it would in batch; only the aggregation
    keeps state, bounded by |segments| x |days in horizon|. That is
    the 100 TB shape of "enrich the firehose with reference data":
    swap the file source for Kafka and nothing else changes.

    Batch-equivalent to the same join+rollup in SQL, which is what
    makes it oracle-checkable after the drain.
    """
    stream = stream_events(spark, path)
    enriched = stream.join(dim, "user_id")  # stream-static, stateless
    agg = enriched.groupBy(
        F.col("segment"), F.to_date("ts").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )
    return drain_to_memory(agg, "segment_daily_sink", "complete")


def click_purchase_attribution_available_now(
    spark: SparkSession,
    path: str,
    gap_minutes: int = 30,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stream-STREAM interval join: the click stream inner-joins the
    purchase stream on user with an event-time range condition
    (purchase strictly after the click, within ``gap_minutes``), both
    sides watermarked, drained via availableNow into an append-mode
    memory sink.

    This is the stateful-join capability stream-static (q78) does not
    exercise: each side buffers rows in the state store until the
    OTHER side's watermark passes the range bound, so state is bounded
    by (watermark horizon + gap) x arrival rate — the condition Spark
    requires before it will even run the join. For an inner join,
    append mode emits exactly the matched rows, so the drained sink
    equals the identical batch self-join — what makes it
    oracle-checkable.

    Returns (user_id, click_id, purchase_id, click_ts, purchase_ts).
    """
    ev = stream_events(spark, path)
    clicks = (
        ev.where(F.col("event_type") == "click")
        .select(
            F.col("user_id"),
            F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", watermark)
    )
    purchases = (
        ev.where(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user_id"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", watermark)
    )
    joined = clicks.join(
        purchases,
        (F.col("user_id") == F.col("p_user_id"))
        & (F.col("purchase_ts") > F.col("click_ts"))
        & (
            F.col("purchase_ts")
            <= F.col("click_ts") + F.expr(f"INTERVAL {gap_minutes} MINUTES")
        ),
    ).select("user_id", "click_id", "purchase_id", "click_ts", "purchase_ts")
    return drain_to_memory(joined, "click_purchase_sink", "append")


def stream_to_lake_upsert(
    spark: SparkSession,
    input_path: str,
    base: str,
    checkpoint: str,
    key_cols: list[str] | None = None,
) -> None:
    """Streaming ingest INTO the lake with exactly-once day partitions:
    a foreachBatch sink that splits each micro-batch by event day and
    key-level-upserts every day via sources.lake.upsert_partition.

    foreachBatch + upsert is the idempotent-sink pattern: the
    checkpoint makes batch REPLAY the failure mode (a batch can run
    twice, never half), and the keyed upsert makes replay a no-op —
    at-least-once delivery composes into exactly-once lake state, with
    no sink transaction log required. Per batch the day list is tiny
    (a micro-batch spans minutes), so the driver-side loop over days
    is bounded; each upsert touches ONE day directory.

    Rows with a NULL ts land in the ``9999-12-31`` sentinel partition
    (quarantine for later repair) rather than wedging the stream with
    an unsortable day list or silently dropping out of every day
    filter. CAVEAT: idempotence is per (day, key) — it assumes a
    redelivered event carries the SAME ts (the contract of a replayed
    extraction). A redelivery whose ts moves across midnight lands in
    a different day directory and would survive alongside the
    original; cross-day key dedup would require scanning the whole
    table, which is not a per-batch-sized operation.
    """
    from cloud_native_medical_data_etl_pipeline_spark.sources import lake

    keys = key_cols or ["event_id"]

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        # one source scan per batch: day column computed once, frame
        # persisted across the days-collect + per-day upserts (each
        # upsert alone re-reads its input several times — dedup,
        # anti-join key set, checkpointed union)
        batch = batch_df.withColumn(
            "__day",
            F.coalesce(
                F.date_format("ts", "yyyy-MM-dd"), F.lit("9999-12-31")
            ),
        ).persist()
        try:
            days = [
                r["__day"]
                for r in batch.select("__day").dropDuplicates().collect()
            ]
            for day in sorted(days):
                day_rows = batch.where(F.col("__day") == day).drop("__day")
                lake.upsert_partition(
                    batch_df.sparkSession, base, day_rows, day, keys
                )
        finally:
            batch.unpersist()

    q = (
        stream_events(spark, input_path)
        .writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
