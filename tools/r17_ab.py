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


def q30_repart(spark, sf_dir):
    """q30 with the events frame hash-pinned on user_id ahead of the
    sessionization windows (the q37 treatment: defeat AQE coalescing
    of the window's own exchange at small shuffle volumes)."""
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.operators import (
        sessions as SS,
    )

    slots = spark.sparkContext.defaultParallelism
    ev = em._t(spark, sf_dir, "events").repartition(slots, "user_id")
    return SS.session_stats(ev, gap_minutes=30).select(
        "user_id",
        "session_id",
        "n_events",
        F.unix_micros("session_start").alias("start_us"),
        F.unix_micros("session_end").alias("end_us"),
        F.round("duration_s", 6).alias("duration_s"),
    )


def q29_repart(spark, sf_dir):
    """q29 with the single-scan conditional projection hash-pinned on
    user_id ahead of the asof window."""
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.operators import joins as J

    slots = spark.sparkContext.defaultParallelism
    ev = (
        em._t(spark, sf_dir, "events")
        .select("user_id", "ts", "event_type", "event_id", "value")
        .repartition(slots, "user_id")
    )
    out = J.asof_join_same_source(
        ev,
        on="user_id",
        ts_col="ts",
        left_pred=F.col("event_type") == "click",
        right_pred=F.col("event_type") == "purchase",
        left_keep=["event_id"],
        right_payload=["event_id", "value"],
        prefix="last_",
    )
    return out.select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_micros("ts").alias("click_us"),
        F.col("last_event_id").alias("purchase_id"),
        F.unix_micros("last_ts").alias("purchase_us"),
        F.col("last_value").alias("purchase_value"),
    )


def q06_repart(spark, sf_dir):
    """q06 with events hash-pinned on user_id BEFORE the argmax
    aggregate: the registered plan pays a partial SortAggregate over
    the whole single-file scan on ONE task (struct buffers don't
    hash-aggregate); pre-hashing turns it into a parallel post-shuffle
    aggregate at the cost of shuffling event rows instead of 1 partial
    row per user."""
    import __spark_entry__ as em

    slots = spark.sparkContext.defaultParallelism
    ev = em._t(spark, sf_dir, "events").repartition(slots, "user_id")
    top = F.max(F.struct("ts", "event_id", "event_type")).alias("__top")
    return ev.groupBy("user_id").agg(top).select(
        "user_id",
        F.col("__top.event_id").alias("event_id"),
        F.col("__top.event_type").alias("event_type"),
        F.col("__top.ts").alias("ts"),
    )


def _q17_verify_old(base, num_hashes, bands, jaccard_threshold):
    """Pre-r17 dedup._minhash_verify_pairs, preserved verbatim: the
    pair dedup shuffles on (key_a, key_b) and the key_a verification
    join re-shuffles the candidates (LANDED r17 replacement hashes on
    key_a once so both ride one exchange)."""
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import (
        _minhash_band_cols,
    )

    sh = base.select("k", "sh")
    band_cols = _minhash_band_cols(num_hashes, bands)
    banded = base.select("k", F.explode(F.array(*band_cols)).alias("bucket"))
    candidates = (
        banded.select(F.col("k").alias("key_a"), "bucket")
        .join(banded.select(F.col("k").alias("key_b"), "bucket"), "bucket")
        .where(F.col("key_a") < F.col("key_b"))
        .select("key_a", "key_b")
        .dropDuplicates(["key_a", "key_b"])
    )
    return (
        candidates.join(
            sh.select(F.col("k").alias("key_a"), F.col("sh").alias("sh_a")),
            "key_a",
        )
        .join(
            sh.select(F.col("k").alias("key_b"), F.col("sh").alias("sh_b")),
            "key_b",
        )
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
                6,
            ),
        )
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("key_a", "key_b", "jaccard")
    )


def q17_old(spark, sf_dir):
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import (
        _minhash_base_arrow,
        _with_cached_deps,
        rebalance_for_cpu,
    )

    docs = em._t(spark, sf_dir, "documents")
    pre = rebalance_for_cpu(
        docs.select(F.col("doc_id").alias("k"), F.col("text").alias("txt")),
        persist=False,
    )
    base = _minhash_base_arrow(pre, em._MH_N, em._MH_H).persist()
    out = _q17_verify_old(base, em._MH_H, em._MH_BANDS, em._MH_THRESH)
    return _with_cached_deps(out, base)


_HOT_WORDS = (
    "patient dose trial cohort outcome adverse reaction placebo arm "
    "baseline endpoint follow up screening visit protocol deviation "
    "serious event hospital discharge recovery relapse remission"
).split()


def _hot_corpus(spark):
    """Synthetic near-dup HUB corpus: 1000 low-id docs are small
    mutations of ONE base text (so every candidate pair inside the
    cluster lands on a LOW key_a — the concentration the key_a
    repartition is accused of), plus 4000 unique-ish docs."""
    import random

    rnd = random.Random(17)
    base = " ".join(rnd.choice(_HOT_WORDS) for _ in range(120))
    rows = []
    for i in range(1000):
        toks = base.split()
        # mutate 3 deterministic positions so jaccard stays high
        for j in range(3):
            toks[(i * 7 + j * 13) % len(toks)] = f"tok{i % 25}_{j}"
        rows.append((i, " ".join(toks)))
    for i in range(1000, 5000):
        rows.append(
            (i, " ".join(rnd.choice(_HOT_WORDS) + str(rnd.randrange(500))
                         for _ in range(120)))
        )
    return spark.createDataFrame(rows, "doc_id long, text string")


def _q17_on_corpus(spark, shared):
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.operators import (
        dedup as D,
    )
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import (
        _minhash_base_arrow,
        _minhash_verify_pairs,
        _with_cached_deps,
        rebalance_for_cpu,
    )

    docs = _hot_corpus(spark)
    pre = rebalance_for_cpu(
        docs.select(F.col("doc_id").alias("k"), F.col("text").alias("txt")),
        persist=False,
    )
    base = _minhash_base_arrow(pre, em._MH_N, em._MH_H).persist()
    # shared=True -> the LANDED registered verify; False -> preserved old
    fn = _minhash_verify_pairs if shared else _q17_verify_old
    out = fn(base, em._MH_H, em._MH_BANDS, em._MH_THRESH)
    return _with_cached_deps(out, base)


def q17_hot_old(spark, sf_dir):
    return _q17_on_corpus(spark, shared=False)


def q17_hot_shared(spark, sf_dir):
    return _q17_on_corpus(spark, shared=True)


def q20_dcast(spark, sf_dir):
    """Pre-r17 shape reproduced: the banded group path used to cast
    every vector to array<double> JVM-side BELOW the rebalance
    exchange (so the shuffle carried float64). Feeding a pre-cast
    frame to the registered operator reproduces that byte/compute
    shape within one projection."""
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.operators import (
        dedup as D,
    )

    emb = em._t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    return D.embedding_near_dups(
        emb, threshold=em._COS_THRESH, plane_bands=em._HP_BANDS
    )


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
    # old = float64-shuffle shape (pre-r17), new = registered float32
    "q20_f32": (q20_dcast, _new("q20_embedding_near_dups")),
    # old = preserved pre-r17 verify; new = registered (shared key_a
    # exchange, landed r17)
    "q17_shared": (q17_old, _new("q17_minhash_near_dups")),
    # same comparison on the synthetic near-dup-hub corpus (the key_a
    # concentration worst case the r16 write-up flagged)
    "q17_hot": (q17_hot_old, q17_hot_shared),
    # the q37 keyed-repartition treatment tried on the other
    # key-partitioned headline stages (old = registered form)
    "q30_repart": (_new("q30_session_stats"), q30_repart),
    "q29_repart": (_new("q29_asof_attribution"), q29_repart),
    "q06_repart": (_new("q06_latest_event_per_user"), q06_repart),
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
