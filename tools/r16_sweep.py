"""Plan-shape sweep over EVERY registered query at sf0.001: reports
Exchange count, join strategies, Python-eval nodes, and flags
suspicious shapes (CartesianProduct, row-at-a-time BatchEvalPython).
Output: TSV on stdout. Some builders execute work at build time
(streaming emulations, index builds) — that cost is build cost, not
plan cost, and is reported as build_s.
"""

from __future__ import annotations

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SWEEP_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    from cloud_native_medical_data_etl_pipeline_spark.session import get_spark

    spark = get_spark(
        app_name="r16-sweep", master="local[8]", shuffle_partitions=8
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import release

    queries = entry_mod.queries()
    print("query\tbuild_s\texchanges\tjoins\tpy\tflags")
    for name, fn in queries.items():
        t0 = time.perf_counter()
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            print(f"{name}\tERR\t-\t-\t-\t{type(e).__name__}: {e}"[:300])
            continue
        build = round(time.perf_counter() - t0, 2)
        n_ex = len(re.findall(r"\(\d+\) (?:Exchange|BroadcastExchange)", plan))
        n_shuf = len(re.findall(r"\(\d+\) Exchange", plan))
        joins = ",".join(
            sorted(
                set(
                    re.findall(
                        r"\(\d+\) (\w*(?:HashJoin|MergeJoin|NestedLoopJoin|"
                        r"CartesianProduct))",
                        plan,
                    )
                )
            )
        )
        pyev = ",".join(
            sorted(
                set(
                    re.findall(
                        r"\(\d+\) (BatchEvalPython|ArrowEvalPython|MapInPandas|"
                        r"FlatMapGroupsInPandas|MapInArrow|AggregateInPandas)",
                        plan,
                    )
                )
            )
        )
        flags = []
        if "CartesianProduct" in plan:
            flags.append("CARTESIAN")
        if "BatchEvalPython" in plan:
            flags.append("ROW_UDF")
        if n_shuf >= 5:
            flags.append("MANY_SHUFFLES")
        print(
            f"{name}\t{build}\t{n_shuf}\t{joins or '-'}\t{pyev or '-'}\t"
            f"{','.join(flags) or '-'}"
        )
        try:
            release(df)
        except Exception:
            pass


if __name__ == "__main__":
    main()
