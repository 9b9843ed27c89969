"""Partitioned data-lake IO (reference S6-S13, SURVEY.md §2.1).

Replaces the reference's 308-line boto3 S3Loader with Spark-native
reads/writes: Hive-style year=/month=/day= partition layout, snappy
parquet at rest, missing-partition -> empty DataFrame with the declared
schema (reference s3_loader.py:113-115 semantics). Paths can be
local, s3a://, or any Hadoop-supported filesystem — the code is
identical, which is the point.

Partition pruning note: readers should filter on year/month/day (or
call read_partition) — Catalyst prunes directories before listing
files, so a daily job over a 100 TB lake touches one day's files.
"""

from __future__ import annotations

from pyspark.errors import AnalysisException
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

PARTITION_COLS = ("year", "month", "day")

# Error signatures that mean "there is no data here yet" (base path
# absent, or present but holding no files so schema inference fails) —
# the ONLY failures a missing-partition fallback may swallow. Anything
# else (permissions, corrupt footers, transient FS listing errors)
# must propagate: treating it as 'partition missing' would let a
# dynamic overwrite rewrite the day with only the updates batch,
# silently dropping every existing row.
_MISSING_DATA_MARKERS = (
    "PATH_NOT_FOUND",
    "UNABLE_TO_INFER_SCHEMA",
    "Path does not exist",
    "Unable to infer schema",
)


def _is_missing_data_error(e: Exception) -> bool:
    s = str(e)
    return any(m in s for m in _MISSING_DATA_MARKERS)


def partition_path(base: str, date: str) -> str:
    """'2024-01-15' -> base/year=2024/month=01/day=15
    (reference drug_transformer.py:74-75, pipeline_config.yaml:81-84)."""
    year, month, day = date.split("-")
    return f"{base}/year={year}/month={month}/day={day}"


def with_partition_cols(df: DataFrame, date: str) -> DataFrame:
    year, month, day = date.split("-")
    return (
        df.withColumn("year", F.lit(year))
        .withColumn("month", F.lit(month))
        .withColumn("day", F.lit(day))
    )


def write_partitioned(
    df: DataFrame, base: str, date: str, fmt: str = "parquet"
) -> None:
    """Write one day's data under the Hive layout. Dynamic partition
    overwrite replaces just that day, never the whole table."""
    (
        with_partition_cols(df, date)
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(*PARTITION_COLS)
        .format(fmt)
        .save(base)
    )


def read_partition(
    spark: SparkSession,
    base: str,
    date: str,
    schema: T.StructType | None = None,
    fmt: str = "parquet",
) -> DataFrame:
    """Read one day's partition; missing path -> empty DF with the
    declared schema (reference s3_loader.py:113-115). With a schema
    the read skips inference entirely."""
    year, month, day = date.split("-")
    try:
        reader = spark.read.format(fmt)
        if schema is not None:
            reader = reader.schema(schema)
        if fmt == "csv":
            reader = reader.option("header", True)
        df = reader.load(base)
        return df.where(
            (F.col("year") == year) & (F.col("month") == month) & (F.col("day") == day)
        ).drop(*PARTITION_COLS)
    except AnalysisException as e:
        # only the no-data-yet cases fall back to the declared schema;
        # genuine read failures re-raise (see _MISSING_DATA_MARKERS)
        if schema is not None and _is_missing_data_error(e):
            return spark.createDataFrame([], schema=schema)
        raise


def upsert_partition(
    spark: SparkSession,
    base: str,
    updates: DataFrame,
    date: str,
    key_cols: list[str],
    fmt: str = "parquet",
) -> None:
    """Key-level merge into one day's partition: rows whose keys appear
    in ``updates`` are replaced, untouched keys survive — the
    at-least-once -> exactly-once bridge for re-run ingest days
    (a retried extraction can land twice; the lake stays one-row-per-key).

    Scale shape: touches ONE day directory (partition pruning on read,
    dynamic overwrite on write); the survivor set comes from a keyed
    left-anti join, with the (typically small) update key-set broadcast
    by AQE. The merged frame is localCheckpoint-ed BEFORE the overwrite
    — Spark reads lazily, so overwriting files that the plan still
    needs to scan would otherwise race the read.

    Updates with a NULL in any key column raise at execution (r16,
    the apply_cdc contract): the anti-join's SQL equality never
    matches a NULL key, so a null-key update could never REPLACE a
    stored row — it would append a fresh copy on every retried batch,
    the exact duplicate-accumulation this function exists to prevent.
    NULL-key rows already ON DISK are untouched survivors.
    """
    # the updates batch itself may carry duplicate keys (that's the
    # at-least-once scenario) — dedup it too, or both copies would land
    updates = updates.dropDuplicates(key_cols)
    null_key = None
    for c in key_cols:
        cond = F.col(c).isNull()
        null_key = cond if null_key is None else (null_key | cond)
    updates = updates.where(
        F.when(~null_key, F.lit(True)).otherwise(
            F.raise_error(
                F.lit(
                    f"upsert_partition: NULL in key column(s) {key_cols} "
                    "— a null-key update can never replace a stored row "
                    "(SQL equality), only accumulate duplicates"
                )
            )
        )
    )
    try:
        # the partition's OWN schema: reading with schema=updates.schema
        # would silently DROP any column present on disk but absent from
        # the updates batch, and the overwrite would rewrite the day
        # with the narrowed schema — silent data loss
        existing = read_partition(spark, base, date, schema=None, fmt=fmt)
    except AnalysisException as e:
        # first write into an empty/absent table is the ONLY case that
        # may start from an empty existing frame; a transient read
        # failure must NOT be treated as 'partition missing' (the
        # overwrite below would drop every pre-existing row)
        if not _is_missing_data_error(e):
            raise
        existing = spark.createDataFrame([], schema=updates.schema)
    on_disk_only = set(existing.columns) - set(updates.columns)
    if on_disk_only:
        raise ValueError(
            f"upsert_partition: updates batch is missing columns that "
            f"exist in {base} for {date}: {sorted(on_disk_only)} — a "
            "dynamic overwrite would narrow the stored schema. Supply "
            "the columns (nulls are fine) or migrate the table "
            "explicitly."
        )
    survivors = existing.join(
        updates.select(*key_cols).dropDuplicates(), key_cols, "left_anti"
    )
    # allowMissingColumns: updates may ADD columns; survivors get nulls
    merged = survivors.unionByName(
        updates, allowMissingColumns=True
    ).localCheckpoint(eager=True)
    write_partitioned(merged, base, date, fmt=fmt)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    num_buckets: int = 32,
    sort: bool = True,
) -> None:
    """Materialize a table bucketed (and sorted) by the join key.

    This is the shuffle-elimination lever for repeated big-big joins:
    two tables bucketed on the same key with the same bucket count
    join with ZERO Exchange — each task reads matching bucket files
    from both sides (and with sortBy, zero Sort as well). At 100 TB,
    bucketing the fact tables on their join key once at ingest turns
    every downstream join/aggregation on that key into a map-side
    operation. Registered through the session catalog (saveAsTable) —
    bucket metadata lives in the catalog, not the files.
    """
    writer = df.write.format("parquet").mode("overwrite").bucketBy(
        num_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def write_csv_head(df: DataFrame, path: str, n: int = 1000) -> None:
    """The reference's human-readable CSV extract: first N rows
    (drug_transformer.py:304-306). Row choice without a sort is
    nondeterministic in both systems — documented reference behavior."""
    df.limit(n).write.mode("overwrite").option("header", True).csv(path)


# ---------------------------------------------------------------------------
# Object-level catalog helpers (reference s3_loader.py:207-294), via the
# Hadoop FileSystem API so the SAME code serves file://, s3a://, gs://,
# abfs:// — the Spark-native replacement for bucket-specific boto3 calls.
# All driver-side metadata operations: one RPC each, no data movement.
# ---------------------------------------------------------------------------


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    return hpath.getFileSystem(spark._jsc.hadoopConfiguration()), hpath, jvm


def list_objects(spark: SparkSession, prefix: str) -> list[str]:
    """Recursive file listing under a directory prefix (s3_loader
    list_objects semantics); missing prefix -> []."""
    fs, hpath, _ = _fs(spark, prefix)
    if not fs.exists(hpath):
        return []
    out = []
    it = fs.listFiles(hpath, True)
    while it.hasNext():
        out.append(it.next().getPath().toString())
    return sorted(out)


def object_exists(spark: SparkSession, path: str) -> bool:
    fs, hpath, _ = _fs(spark, path)
    return bool(fs.exists(hpath))


def object_size(spark: SparkSession, path: str) -> int | None:
    """Size in bytes, or None when missing (head_object semantics)."""
    fs, hpath, _ = _fs(spark, path)
    if not fs.exists(hpath):
        return None
    return int(fs.getFileStatus(hpath).getLen())


def delete_object(spark: SparkSession, path: str, recursive: bool = False) -> bool:
    fs, hpath, _ = _fs(spark, path)
    return bool(fs.delete(hpath, recursive))


def list_partition_dates(spark: SparkSession, base: str) -> list[str]:
    """Dates present under the year=/month=/day= layout, ascending —
    directory metadata only, no file reads."""
    fs, hpath, jvm = _fs(spark, base)
    if not fs.exists(hpath):
        return []
    glob = jvm.org.apache.hadoop.fs.Path(f"{base}/year=*/month=*/day=*")
    dates = []
    for st in fs.globStatus(glob) or []:
        p = st.getPath()
        day = p.getName().split("=", 1)[1]
        month = p.getParent().getName().split("=", 1)[1]
        year = p.getParent().getParent().getName().split("=", 1)[1]
        dates.append(f"{year}-{month}-{day}")
    return sorted(dates)


def latest_partition_date(spark: SparkSession, base: str) -> str | None:
    """Newest day available — what an incremental daily job resumes
    from."""
    dates = list_partition_dates(spark, base)
    return dates[-1] if dates else None


def compact_partition(
    spark: SparkSession,
    base: str,
    date: str,
    target_bytes: int = 128 << 20,
    fmt: str = "parquet",
) -> int:
    """Rewrite one day's partition into ~target_bytes files — the
    small-files remedy for streaming/incremental sinks (a day that
    accumulated thousands of tiny files reads back as thousands of
    tasks and NameNode/listing pressure).

    File count comes from the partition's actual on-disk size, read
    from filesystem metadata (no data scan); the day is then read once,
    repartitioned, and dynamically overwritten (localCheckpoint first —
    same self-overwrite race as upsert_partition). Returns the new
    file count. Compaction is per-day, so a 100 TB lake compacts
    incrementally behind the ingest frontier, never globally.
    """
    import math

    day_dir = partition_path(base, date)
    # ONE recursive listing whose LocatedFileStatus entries already
    # carry sizes — per-file object_size() calls would issue two extra
    # driver→store RPCs per file, on exactly the thousands-of-tiny-
    # files input compaction exists to fix
    fs, hpath, _ = _fs(spark, day_dir)
    total = 0
    if fs.exists(hpath):
        it = fs.listFiles(hpath, True)
        while it.hasNext():
            total += int(it.next().getLen())
    n_files = max(1, math.ceil(total / target_bytes))
    df = read_partition(spark, base, date, fmt=fmt)
    merged = df.repartition(n_files).localCheckpoint(eager=True)
    write_partitioned(merged, base, date, fmt=fmt)
    return n_files


def write_sharded(
    df: DataFrame,
    path: str,
    rows_per_shard: int = 100_000,
    fmt: str = "parquet",
) -> None:
    """Write size-uniform shards for sequential training consumption:
    ``maxRecordsPerFile`` caps every output file at ``rows_per_shard``
    rows, so dataloader workers stream uniform chunks. The repartition
    count is derived from a metadata-free count of the plan — one extra
    job, but shard writing is a once-per-corpus operation. No shard is
    ever larger than the cap; the last shard per task may be smaller.
    """
    import math

    n = df.count()
    tasks = max(1, math.ceil(n / rows_per_shard))
    (
        df.repartition(tasks)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", rows_per_shard)
        .format(fmt)
        .save(path)
    )


def write_clustered(
    df: DataFrame,
    path: str,
    cluster_cols: list[str],
    num_files: int = 8,
    fmt: str = "parquet",
) -> None:
    """Range-cluster the table on ``cluster_cols`` before writing:
    `repartitionByRange` routes each key range to one output file and
    `sortWithinPartitions` orders rows inside it, so every file (and
    every parquet row group) covers a NARROW min/max band of the
    cluster columns. Parquet stores those min/max stats per file and
    row group; a selective predicate on a cluster column then skips
    whole files at planning/scan time instead of reading and
    discarding — the data-skipping lever that turns a 100 TB scan
    with a tight filter into an I/O-proportional one (the single-
    dimension form of Z-ordering; for genuinely multi-column skipping
    interleave a computed z-value and cluster on that).

    `tests/test_bucketed.py::test_clustered_write_skips_files` proves
    the skip by counting distinct `input_file_name()` under a range
    predicate: clustered reads touch ~1/num_files of the files where
    the unclustered layout touches all of them.
    """
    (
        df.repartitionByRange(num_files, *[F.col(c) for c in cluster_cols])
        .sortWithinPartitions(*cluster_cols)
        .write.mode("overwrite")
        .format(fmt)
        .save(path)
    )
