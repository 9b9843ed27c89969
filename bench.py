"""Benchmark runner: times the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints
ONE JSON line:
  {"metric": ..., "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ...}

Each query is fully executed via a count + full-column checksum
aggregate (r12: a bare count() let Catalyst eliminate q02's final
left join — and with it the containment subtree — from the timed
plan) so the timing covers the complete declared plan: scan ->
compute -> every output column, not just plan construction.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

# Headline set: one per operator family that matters at scale.
HEADLINE = [
    "q01_pricing_summary",      # wide-scan multi-agg
    "q02_containment_enrich",   # broadcast theta-join enrichment
    "q03_exact_dedup",          # hash dedup w/ semi-join
    "q06_latest_event_per_user",# window argmax
    "q10_ship_delay",           # big equi-join + agg
    "q14_hourly_windows",       # tumbling-window agg
    "q15_text_stats",           # text kernels over documents
    "q17_minhash_near_dups",    # minhash LSH near-dup pipeline
    "q19_cosine_topk",          # brute-force vector top-k
    "q27_top_revenue",          # filtered 3-way join + top-k
    "q29_asof_attribution",     # as-of join (union+window)
    "q30_session_stats",        # gap sessionization
    "q20_embedding_near_dups",  # vectorized all-pairs cosine (mapInPandas)
    "q33_pivot_activity",       # one-pass pivot
    "q37_event_followups",      # time-bin-blocked interval join
]


def consume_full(df) -> int:
    """Execute the FULL declared plan and return the row count.

    A bare ``df.count()`` is NOT full execution: Catalyst eliminates a
    final left join whose key-unique aggregated right side goes
    unreferenced (q02 lost its whole containment subtree that way,
    r1–r11), and column pruning drops computed expressions nothing
    references (q15's text kernels timed as a bare scan).  Referencing
    every output column in a checksum pins the plan.  Regression-
    pinned by tests/test_plans.py against the q02 join count.

    The combiner is bit_xor, NOT sum (ADVICE r12): summing xxhash64
    values overflows int64 almost surely at sf0.1 and only "worked"
    because the session pins ANSI off — under ANSI (Spark 4's
    default) every bench run would die with ARITHMETIC_OVERFLOW.
    XOR is closed over int64, references the columns identically,
    and is a TIMING consumption only — never a correctness checksum
    (it is order-independent but collision-prone by construction)."""
    from pyspark.sql import functions as F

    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(F.xxhash64(*[F.col(c) for c in df.columns])).alias("c"),
    ).first()
    return row["n"]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    from cloud_native_medical_data_etl_pipeline_spark.session import get_spark

    t_boot = time.perf_counter()
    spark = get_spark(
        app_name=f"bench-sf{sf}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # Untimed warmup: JIT/codegen compilation, parquet footer cache, and
    # broadcast machinery all pay first-use costs that belong to JVM
    # startup, not to any query. One tiny aggregate over each table.
    from pyspark.sql import functions as _F

    for tbl in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            entry_mod._t(spark, sf_dir, tbl).limit(100).agg(
                _F.count(_F.lit(1))
            ).collect()
        except Exception:
            pass
    # exercise the interpreted-expression paths (higher-order funcs,
    # md5, window) once so their JVM class-loading cost is not billed
    # to the first query that uses them
    try:
        from cloud_native_medical_data_etl_pipeline_spark.functions import text as _X

        entry_mod._t(spark, sf_dir, "documents").limit(50).select(
            _F.md5(_F.concat_ws("", _X.word_ngrams("text", 3)))
        ).collect()
    except Exception:
        pass
    # exercise the Arrow python-runner path (mapInPandas) once: worker
    # pool spin-up + Arrow serializer class-loading is per-JVM cost
    try:
        entry_mod._t(spark, sf_dir, "embeddings").limit(64).repartition(
            int(cpus)
        ).mapInPandas(
            lambda it: it, "vec_id long, embedding array<float>, label int"
        ).collect()
    except Exception:
        pass

    # session-start cost (JVM boot + import/registration + warmup) is
    # reported SEPARATELY from query time: entry-module growth inflates
    # this number, never the per-query timings — the r5 bench
    # investigation's disaggregation ask
    startup = round(time.perf_counter() - t_boot, 3)

    # two passes, keep the per-query MIN: a transient co-tenant load
    # spike on the shared host otherwise records a 5x-noise outlier as
    # the round's number. r6: default raised to min-of-3 — bracketing
    # runs showed this host swings individual passes by ±15% with NO
    # code change (7.14/8.53/8.23 s across 3 back-to-back 2-pass runs),
    # and a third pass recovers most of that at ~4 s extra wall time.
    passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "5"))
    # caller-unpersists contract (operators/dedup.py release): each
    # query call persists fresh intermediates; without releasing them
    # after the timed count, a multi-pass bench leaks passes x queries
    # cached frames for the session's lifetime
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import (
        release,
    )

    # r11: reps run CONSECUTIVELY per query instead of interleaved
    # passes, and the bracket is ADAPTIVE.  This host first-touches
    # pages at ~10 MB/s, so the first executions of an allocation-heavy
    # stage pipeline bill page-fault time to the query; with
    # interleaved passes the 14 other queries evict that warmth between
    # reps and deep-pipeline queries never converge (r10 recorded q17
    # at 1.28 s across 5 interleaved passes while a dedicated
    # consecutive bracket on the same kernels converged
    # 6.18 -> 0.906 s).  Back-to-back reps give every query the same
    # warm bracket, and a query still descending after `passes` reps
    # (the page-fault ramp outlasting the base bracket) keeps going —
    # up to 2x passes — until the running MIN stalls for three
    # consecutive reps.  The recorded number stays the per-query min;
    # the rule is uniform across all queries.
    max_reps = int(
        os.environ.get("SPARK_GRAFT_BENCH_MAX_REPS", str(passes * 2))
    )
    # one UNTIMED execution of every headline query first — each
    # query's first in-rotation execution is excluded from its timed
    # bracket, so the global JVM/page ramp (which otherwise lands
    # almost entirely on whichever query runs first — q01's bracket
    # was absorbing it for the whole set) is paid before any timing
    # starts
    # r12: consumption is `consume_full` (count + full-column
    # checksum), not a bare count() — see its docstring and
    # BASELINE.md "r12 consumption re-basing" for the measured
    # per-query attribution (q15 6.2×, q02 1.44×, q29/q33 ~1.5×).
    consume = consume_full

    for name in HEADLINE:
        df = queries[name](spark, sf_dir)
        consume(df)
        release(df)
    # r14 (r13 verdict next-step #5): one bench process used to record
    # ONE bracket, and cross-round comparisons chased ±15% host noise
    # (r13's three manual brackets spanned 8.2–10.4 s on an identical
    # tree).  The bench now runs `brackets` full consecutive-adaptive
    # brackets itself and reports BOTH the per-bracket totals (the
    # noise envelope, in-payload) and the cross-bracket per-query
    # minima — `value` is the sum of minima, the same
    # checksum-consumption-floor methodology BASELINE.md re-bases
    # against, so round-over-round deltas are kernel deltas.
    brackets = int(os.environ.get("SPARK_GRAFT_BENCH_BRACKETS", "3"))
    # wall-clock insurance: if the host is slow enough that further
    # brackets would risk an external runner's timeout (and therefore
    # the WHOLE payload), stop after the current bracket once the
    # budget is spent — one bracket is a valid single-bracket record,
    # the payload's bracket_totals length says what happened
    budget_s = float(os.environ.get("SPARK_GRAFT_BENCH_BUDGET_S", "900"))
    t_loop = time.perf_counter()
    bracket_best: list[dict[str, float]] = []
    # reps are recorded PER BRACKET (a list per query): each entry is
    # bounded by max_reps, so convergence stays comparable to the
    # single-bracket r12/r13 payloads
    reps_used: dict[str, list[int]] = {name: [] for name in HEADLINE}
    # a bracket that the budget interrupts mid-flight (ADVICE r14: the
    # between-bracket guard alone let one slow bracket overrun an
    # external timeout).  Bracket 1 always completes — the payload's
    # floor is a full single-bracket record — and the partial
    # bracket's timings still feed per-query minima (a min over the
    # brackets a query actually ran in is valid per query), just not
    # bracket_totals.
    partial_bracket: dict[str, float] | None = None
    for b in range(brackets):
        timings: dict[str, float] = {}
        for name in HEADLINE:
            if b > 0 and time.perf_counter() - t_loop > budget_s:
                partial_bracket = timings
                print(
                    f"  bench budget ({budget_s}s) spent inside bracket "
                    f"{b + 1} after {len(timings)}/{len(HEADLINE)} queries;"
                    " recording it as a partial bracket",
                    file=sys.stderr,
                )
                break
            fn = queries[name]
            n, best, stall = -1, float("inf"), 0
            for rep in range(max_reps):
                t0 = time.perf_counter()
                df = fn(spark, sf_dir)
                n = consume(df)
                took = round(time.perf_counter() - t0, 3)
                release(df)
                if took < best * 0.98:
                    best, stall = min(took, best), 0
                else:
                    best, stall = min(took, best), stall + 1
                # deep-pipeline queries descend slowly on this host
                # (the page-fault ramp): stop only after the running
                # min has stalled three reps in a row past the base
                # bracket
                if rep + 1 >= passes and stall >= 3:
                    break
            timings[name] = best
            reps_used[name].append(rep + 1)
            print(
                f"  [bracket {b + 1}/{brackets}] {name}: {best:.3f}s "
                f"({n} rows, {rep + 1} reps)",
                file=sys.stderr,
            )
        if partial_bracket is not None:
            break
        bracket_best.append(timings)
        print(
            f"  bracket {b + 1} total: {round(sum(timings.values()), 3)}s",
            file=sys.stderr,
        )
        if time.perf_counter() - t_loop > budget_s and b + 1 < brackets:
            print(
                f"  bench budget ({budget_s}s) spent after bracket {b + 1};"
                " emitting what we have",
                file=sys.stderr,
            )
            break

    per_query_min = {
        name: min(
            [bb[name] for bb in bracket_best]
            + (
                [partial_bracket[name]]
                if partial_bracket and name in partial_bracket
                else []
            )
        )
        for name in HEADLINE
    }
    bracket_totals = [round(sum(bb.values()), 3) for bb in bracket_best]
    total = round(sum(per_query_min.values()), 3)
    print(
        json.dumps(
            {
                "metric": f"total_runtime_{len(HEADLINE)}_headline_queries",
                "value": total,
                "unit": "sec",
                "queries": per_query_min,
                "startup_sec": startup,
                # methodology provenance (ADVICE r11): `passes` alone
                # silently mixed the r11 bracket change into cross-round
                # comparisons — record the bracket rule, its bounds, and
                # the actual per-query rep counts in the payload itself
                "bracket": "multibracket-min-r14-checksum",
                "brackets": brackets,
                "bracket_totals": bracket_totals,
                "per_query_min": per_query_min,
                "passes": passes,
                "max_reps": max_reps,
                # renamed from "reps" when the type changed from
                # dict[str, int] to dict[str, list[int]] (one entry per
                # bracket the query ran in; the last may belong to a
                # partial bracket) — old-format consumers fail loudly
                # on the missing key instead of mis-parsing (ADVICE r14)
                "reps_per_bracket": reps_used,
                # timings of a budget-interrupted bracket (None when
                # every bracket completed); folded into per-query
                # minima but never into bracket_totals
                "partial_bracket": partial_bracket,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
