"""Capture .explain("formatted") for every headline query into
plans/r17/<query>_<tag>.txt (tag = before|after), plus a one-line
summary (Exchange count, join strategies, Python-eval nodes) on stdout.

Usage:  python tools/r17_plans.py before|after [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("PLANS_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r17"
)

HEADLINE = [
    "q01_pricing_summary",
    "q02_containment_enrich",
    "q03_exact_dedup",
    "q06_latest_event_per_user",
    "q10_ship_delay",
    "q14_hourly_windows",
    "q15_text_stats",
    "q17_minhash_near_dups",
    "q19_cosine_topk",
    "q27_top_revenue",
    "q29_asof_attribution",
    "q30_session_stats",
    "q20_embedding_near_dups",
    "q33_pivot_activity",
    "q37_event_followups",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    picks = sys.argv[2:] or HEADLINE
    os.makedirs(OUT_DIR, exist_ok=True)

    from cloud_native_medical_data_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name=f"plans-r17-{tag}",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import release

    queries = entry_mod.queries()
    for name in picks:
        df = queries[name](spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        release(df)
        # formatted explain prints each operator twice (tree + details);
        # count only the numbered detail headers
        n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
        joins = sorted(
            set(re.findall(r"(\w*(?:HashJoin|MergeJoin|NestedLoopJoin))", plan))
        )
        pyev = sorted(
            set(
                re.findall(
                    r"(BatchEvalPython|ArrowEvalPython|MapInPandas|"
                    r"FlatMapGroupsInPandas|MapInArrow)",
                    plan,
                )
            )
        )
        print(
            f"{name}: Exchange={n_ex} joins={joins or '-'} py={pyev or '-'} "
            f"-> {path}"
        )


if __name__ == "__main__":
    main()
