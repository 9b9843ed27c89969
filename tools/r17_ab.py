"""r17 A/B harness: interleave reps of query variants in ONE session so
host drift and page-cache ramp hit both equally (same methodology as
tools/r16_ab.py; that file keeps the r16 pairs and negatives).

Usage: python tools/r17_ab.py <pair> [--reps 10]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import Window  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402


# ---------------------------------------------------------------------------
# q37 candidates. Registered form (r16): followup_stats = 1 exchange on
# user_id, Window over (user_id) [4 frames] -> Sort -> Window over
# (user_id, event_type) [2 frames] -> groupBy(event_type).
# ---------------------------------------------------------------------------
def _q37_tail(per):
    """The registered q37 aggregate tail, verbatim."""
    return (
        per.groupBy("event_type")
        .agg(
            F.sum("fu_count").alias("n_pairs"),
            F.sum("fu_gap_sum_us").alias("__gap_total_us"),
            F.sum("fu_same_count").cast("long").alias("n_same_type"),
        )
        .where(F.col("n_pairs") > 0)
        .select(
            "event_type",
            "n_pairs",
            F.round(
                F.col("__gap_total_us").cast("double") / F.col("n_pairs") / F.lit(1e6),
                6,
            ).alias("avg_gap_s"),
            "n_same_type",
        )
    )


def _q37_types_impl(spark, sf_dir, repart=False, dec_prec=20):
    """Static-type variant: fu_same_count via per-type conditional
    counts over the SAME (user_id, __us) sort — the second Sort +
    Window pass disappears; all frames ride ONE WindowExec."""
    import __spark_entry__ as em

    hi_us = 3600 * 1_000_000
    ev = em._t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    pre = ev.where(
        F.col("user_id").isNotNull() & F.col("ts").isNotNull()
    ).withColumn("__us", F.unix_micros(F.col("ts")))
    if repart:
        slots = spark.sparkContext.defaultParallelism
        pre = pre.repartition(slots, "user_id")
    dec_us = F.col("__us").cast(f"decimal({dec_prec},0)")
    base = Window.partitionBy("user_id").orderBy("__us")
    w_hi = base.rangeBetween(Window.unboundedPreceding, hi_us)
    w_lo = base.rangeBetween(Window.unboundedPreceding, 0)
    one = F.count(F.lit(1))
    fu_count = (one.over(w_hi) - one.over(w_lo)).alias("fu_count")
    ts_sum = (F.sum(dec_us).over(w_hi) - F.sum(dec_us).over(w_lo)).alias(
        "__ts_sum"
    )

    def type_cnt(t, w):
        return F.count(F.when(F.col("event_type") == t, 1)).over(w)

    same = F.lit(0)
    for t in em._EVENT_TYPES:
        same = F.when(
            F.col("event_type") == t, type_cnt(t, w_hi) - type_cnt(t, w_lo)
        ).otherwise(same)
    per = (
        pre.select("*", fu_count, ts_sum, same.alias("fu_same_count"))
        .withColumn(
            "fu_gap_sum_us",
            F.col("__ts_sum")
            - F.col("fu_count").cast("decimal(12,0)") * dec_us,
        )
        .drop("__us", "__ts_sum")
    )
    return _q37_tail(per)


def q37_types(spark, sf_dir):
    return _q37_types_impl(spark, sf_dir)


def q37_types_repart(spark, sf_dir):
    return _q37_types_impl(spark, sf_dir, repart=True)


def q37_repart(spark, sf_dir):
    """Registered two-window kernel, but with a pinned hash
    repartition(slots, user_id) ahead of the windows (AQE coalesces
    the ENSURE_REQUIREMENTS exchange's output to ~bytes/1MB partitions
    at this SF; an explicit numPartitions is exempt from coalescing)."""
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.operators.joins import (
        followup_stats,
    )

    slots = spark.sparkContext.defaultParallelism
    ev = (
        em._t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type")
        .where(F.col("user_id").isNotNull() & F.col("ts").isNotNull())
        .repartition(slots, "user_id")
    )
    per = followup_stats(
        ev, on="user_id", ts="ts", lo_s=0.0, hi_s=3600.0, same_col="event_type"
    )
    return _q37_tail(per)


def _new(name):
    def fn(spark, sf_dir):
        import __spark_entry__ as em

        return em.queries()[name](spark, sf_dir)

    return fn


PAIRS = {
    # old = registered r16 followup_stats form
    "q37_types": (_new("q37_event_followups"), q37_types),
    "q37_repart": (_new("q37_event_followups"), q37_repart),
    "q37_types_repart": (_new("q37_event_followups"), q37_types_repart),
    # head-to-head: does the single-window types form add anything on
    # top of the pinned repartition?
    "q37_repart_vs_types": (q37_repart, q37_types_repart),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pairs", nargs="+", choices=sorted(PAIRS))
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--check", action="store_true",
                    help="assert old/new collect() results are identical")
    args = ap.parse_args()

    from cloud_native_medical_data_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r17-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import consume_full
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import release

    for pair in args.pairs:
        old_fn, new_fn = PAIRS[pair]
        if args.check:
            a = sorted(map(tuple, old_fn(spark, SF_DIR).collect()))
            b = sorted(map(tuple, new_fn(spark, SF_DIR).collect()))
            assert a == b, f"{pair}: MISMATCH\nold={a[:5]}\nnew={b[:5]}"
            print(f"{pair}: collect-identical ({len(a)} rows)")
        # warm both variants untimed (page/codegen ramp)
        for fn in (old_fn, new_fn, old_fn, new_fn):
            df = fn(spark, SF_DIR)
            consume_full(df)
            release(df)
        walls = {"old": [], "new": []}
        for _ in range(args.reps):
            for tag, fn in (("old", old_fn), ("new", new_fn)):
                t0 = time.perf_counter()
                df = fn(spark, SF_DIR)
                consume_full(df)
                walls[tag].append(round(time.perf_counter() - t0, 3))
                release(df)
        print(
            f"{pair}: old min={min(walls['old']):.3f} new min="
            f"{min(walls['new']):.3f}  old={walls['old']}  new={walls['new']}"
        )


if __name__ == "__main__":
    main()
