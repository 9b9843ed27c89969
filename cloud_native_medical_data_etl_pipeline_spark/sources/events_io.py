"""Schema-conditional IO for the events table (batch + streaming).

The events parquet has shipped with two physical encodings of ``ts``:
``TIMESTAMP(MICROS)`` (what Spark reads natively as TimestampNTZ/
Timestamp) and ``TIMESTAMP(NANOS)`` (which Spark's reader only accepts
as int64 via ``spark.sql.legacy.parquet.nanosAsLong``). Round 1
hard-coded the nanos assumption and every events query died at
analysis time when the data regenerated as micros. These helpers
inspect the footer schema and normalize either encoding to a proper
timestamp column, so a future testdata regeneration can't strand the
suite again.

Scale note: the schema probe is one parquet footer read (no data scan)
and the nanos->micros conversion is a JVM-side integer projection —
both free at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def _is_long(dtype: T.DataType) -> bool:
    return isinstance(dtype, T.LongType)


def read_events(spark: SparkSession, path: str, ts_col: str = "ts") -> DataFrame:
    """Batch-read events parquet with ``ts`` normalized to timestamp.

    nanosAsLong is enabled so TIMESTAMP(NANOS) data arrives as int64;
    the conversion is applied ONLY when the column actually reads as
    long — TIMESTAMP(MICROS) data passes through (as TIMESTAMP_NTZ).

    Either way ts is then cast to TimestampType: downstream operators
    use unix_micros / watermarks, which reject NTZ. The session tz is
    pinned to UTC so the NTZ->Timestamp cast is value-preserving and
    Spark's wall-clock functions (to_date, date_trunc, window) agree
    with DuckDB's naive-timestamp semantics exactly.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(path)
    if _is_long(df.schema[ts_col].dataType):
        # integer div, not a double round-trip (precision above 2^53 ns)
        df = df.withColumn(ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000")))
    return df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))


def stream_events(
    spark: SparkSession,
    path: str,
    columns: list[str] | None = None,
    max_files_per_trigger: int | None = None,
    ts_col: str = "ts",
    fallback_schema: T.StructType | None = None,
) -> DataFrame:
    """readStream over events parquet with ``ts`` normalized to
    timestamp, whichever physical encoding the files carry.

    File-stream sources require a directory: a ``*.parquet`` file path
    is split into (parent dir, pathGlobFilter). The stream schema is
    derived from one batch footer probe of the same path — stating the
    physical schema explicitly is required by readStream anyway, and
    deriving it keeps the stream and batch paths agreeing forever.
    When the directory has no files yet (stream started before any
    producer wrote), the probe can't infer anything and
    ``fallback_schema`` is used instead; without one the probe error
    propagates.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        physical = spark.read.parquet(path).schema
    except Exception:
        if fallback_schema is None:
            raise
        physical = fallback_schema
    if columns is not None:
        physical = T.StructType([physical[c] for c in columns])
    ts_is_long = _is_long(physical[ts_col].dataType)

    reader = spark.readStream.schema(physical)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if path.endswith(".parquet"):
        base, _, fname = path.rpartition("/")
        reader = reader.option("pathGlobFilter", fname)
        path = base
    stream = reader.parquet(path)
    if columns is not None:
        stream = stream.select(*columns)
    if ts_is_long:
        stream = stream.withColumn(
            ts_col, F.timestamp_micros(F.expr(f"{ts_col} div 1000"))
        )
    return stream.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
