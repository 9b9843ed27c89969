"""A/B harness: interleave reps of two query variants in ONE session so
host drift and page-cache ramp hit both equally. Variants are built as
(name, fn) pairs below; each fn(spark, sf_dir) -> DataFrame.

Usage: python tools/r16_ab.py <pair> [--reps 10]
Pairs are registered in PAIRS.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

from pyspark.sql import functions as F  # noqa: E402


# ---- old (pre-r16) implementations, copied verbatim ----------------------
def q33_old(spark, sf_dir):
    import __spark_entry__ as em

    ev = em._t(spark, sf_dir, "events")
    out = ev.groupBy("user_id").pivot("event_type", em._EVENT_TYPES).count()
    return out.select(
        "user_id",
        *[
            F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}")
            for t in em._EVENT_TYPES
        ],
    )


def q15_old(spark, sf_dir):
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.functions import text as X

    docs = em._t(spark, sf_dir, "documents")
    toks = F.col("_toks")
    return docs.select(
        "doc_id", "text", X.lower_tokens("text").alias("_toks")
    ).select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(X.stopword_ratio_from_tokens(toks), 6).alias("stop_ratio"),
        F.round(X.punct_ratio("text"), 6).alias("punct_ratio"),
        X.lang_id_from_tokens(toks).alias("lang_guess"),
    )


def q10_old(spark, sf_dir):
    import __spark_entry__ as em

    l = em._t(spark, sf_dir, "lineitem")
    o = em._t(spark, sf_dir, "orders")
    j = l.join(o, l.l_orderkey == o.o_orderkey)
    return j.groupBy("o_orderpriority").agg(
        F.round(
            F.avg(F.datediff("l_shipdate", "o_orderdate")), 6
        ).alias("avg_delay_days"),
        F.max(F.datediff("l_shipdate", "o_orderdate")).alias("max_delay_days"),
        F.count(F.lit(1)).alias("n"),
    )


def q19_new(spark, sf_dir):
    """Fold the query-vector probe into the plan: a broadcast 1-row
    join replaces the per-call .first() collect (one fewer job)."""
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.functions import (
        vectors as V,
    )

    emb = em._t(spark, sf_dir, "embeddings")
    q = emb.where(F.col("vec_id") == 0).select(F.col("embedding").alias("__q"))
    scored = emb.join(F.broadcast(q)).select(
        "vec_id",
        F.round(V.cosine(F.col("embedding"), F.col("__q")), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id").asc()).limit(
        10
    )


def q37_pairform(spark, sf_dir, rebalance=False):
    """Pre-r16 registered form: binned_interval_join pair
    materialization + groupBy (optionally with the rejected
    probe-side rebalance)."""
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.operators import (
        dedup as D,
    )
    from cloud_native_medical_data_etl_pipeline_spark.operators.joins import (
        binned_interval_join,
    )

    ev = em._t(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    left = D.rebalance_for_cpu(ev, persist=False) if rebalance else ev
    pairs = binned_interval_join(
        left,
        ev.select("user_id", "ts", F.col("event_type").alias("next_type")),
        on="user_id",
        lo_s=0.0,
        hi_s=3600.0,
        right_payload=["next_type"],
    )
    return pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.avg(F.col("gap_us") / 1e6), 6).alias("avg_gap_s"),
        F.sum(
            F.when(F.col("r_next_type") == F.col("event_type"), 1).otherwise(0)
        ).cast("long").alias("n_same_type"),
    )


def q37_rebalance(spark, sf_dir):
    """The round's FIRST q37 candidate (rejected): rebalance the probe
    side of the binned interval join."""
    return q37_pairform(spark, sf_dir, rebalance=True)


def q06_old(spark, sf_dir):
    """Pre-r16 window form: row_number over (ts DESC, event_id DESC)."""
    import __spark_entry__ as em
    from pyspark.sql import Window

    ev = em._t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "event_id", "event_type", "ts")
    )


def q03_old(spark, sf_dir):
    """Pre-r16 full-row form: hash-agg min(key) + left-semi join."""
    import __spark_entry__ as em

    docs = em._t(spark, sf_dir, "documents")
    h = F.sha2(F.coalesce(F.col("text"), F.lit("")), 256)
    keep = (
        docs.withColumn("__h", h)
        .groupBy("__h")
        .agg(F.min("doc_id").alias("doc_id"))
        .drop("__h")
    )
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "source"
    )


def q29_old(spark, sf_dir):
    """Pre-r16 two-frame form: clicks/purchases filtered separately
    (TWO scans of events), unioned inside asof_join."""
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.operators import joins as J

    ev = em._t(spark, sf_dir, "events")
    clicks = ev.where(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("event_id").alias("click_id")
    )
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("event_id").alias("purchase_id"), "value"
    )
    out = J.asof_join(
        clicks,
        purchases,
        on="user_id",
        left_ts="ts",
        right_ts="ts",
        left_keep=["click_id"],
        right_payload=["purchase_id", "value"],
        prefix="last_",
    )
    return out.select(
        "user_id",
        "click_id",
        F.unix_micros("ts").alias("click_us"),
        F.col("last_purchase_id").alias("purchase_id"),
        F.unix_micros("last_ts").alias("purchase_us"),
        F.col("last_value").alias("purchase_value"),
    )


def q02_fused(spark, sf_dir):
    """Single-scan candidate: persist the 4-column projection of part
    once and derive all three aggregation grains (drugs / indications
    / conditions) from the cached frame — 3 parquet scans -> 1 scan +
    cache.  Aggregate bodies are copied VERBATIM from the registered
    q02 so values are bit-identical; only the scan count changes."""
    import __spark_entry__ as em
    from cloud_native_medical_data_etl_pipeline_spark.functions import (
        medical as M,
    )
    from cloud_native_medical_data_etl_pipeline_spark.operators import (
        enrich as E,
    )
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import (
        _with_cached_deps,
    )

    part = (
        em._t(spark, sf_dir, "part")
        .select("p_brand", "p_type", "p_retailprice", "p_size")
        .persist()
    )
    drugs = part.groupBy(F.col("p_brand").alias("drug_name")).agg(
        F.count(F.lit(1)).alias("part_count"),
        F.round(F.avg("p_retailprice"), 6).alias("avg_retail"),
    )
    indications = part.select(
        F.col("p_brand").alias("drug_name"),
        M.normalize_for_join("p_type").alias("indication_norm"),
    ).where(F.col("indication_norm") != "").distinct()
    conditions = (
        part.groupBy(
            F.concat_ws(" ", "p_type", "p_brand").alias("condition")
        )
        .agg(
            F.count(F.lit(1)).alias("trial_count"),
            F.round(F.sum("p_retailprice"), 4).alias("total_enrollment"),
            F.sum(F.when(F.col("p_size") > 25, 1).otherwise(0))
            .cast("long")
            .alias("completed_trials"),
        )
        .withColumn("condition_norm", M.normalize_for_join("condition"))
    )
    matched = E.containment_match(indications, conditions)
    stats = matched.groupBy("drug_name").agg(
        F.sum("trial_count").alias("trial_count"),
        F.round(F.sum("total_enrollment"), 2).alias("total_retail"),
        F.sum("completed_trials").alias("completed_trials"),
    )
    out = drugs.join(stats, "drug_name", "left").select(
        "drug_name",
        "part_count",
        "avg_retail",
        F.coalesce("trial_count", F.lit(0)).cast("long").alias("trial_count"),
        F.coalesce("total_retail", F.lit(0.0)).alias("total_retail"),
        F.coalesce("completed_trials", F.lit(0)).cast("long").alias(
            "completed_trials"
        ),
    )
    return _with_cached_deps(out, part)


def _new(name):
    def fn(spark, sf_dir):
        import __spark_entry__ as em

        return em.queries()[name](spark, sf_dir)

    return fn


PAIRS = {
    "q33": (q33_old, _new("q33_pivot_activity")),
    "q15": (q15_old, _new("q15_text_stats")),
    "q10": (q10_old, _new("q10_ship_delay")),
    # old = current registered implementation for these two
    "q19": (_new("q19_cosine_topk"), q19_new),
    # landed in-round: old = preserved pre-r16 form, new = registered impl
    "q37": (q37_pairform, _new("q37_event_followups")),
    # the round's FIRST (rejected) q37 candidate, kept for the record
    "q37_rebal": (q37_pairform, q37_rebalance),
    "q06": (q06_old, _new("q06_latest_event_per_user")),
    "q03": (q03_old, _new("q03_exact_dedup")),
    "q29": (q29_old, _new("q29_asof_attribution")),
    # old = current registered implementation; new = single-scan candidate
    "q02": (_new("q02_containment_enrich"), q02_fused),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("pairs", nargs="+", choices=sorted(PAIRS))
    ap.add_argument("--reps", type=int, default=10)
    args = ap.parse_args()

    from cloud_native_medical_data_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r16-ab",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from bench import consume_full
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import release

    for pair in args.pairs:
        old_fn, new_fn = PAIRS[pair]
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
