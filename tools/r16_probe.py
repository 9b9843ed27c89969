"""Per-query timing probe for the r16 optimization round.

Times one or more headline queries with the bench's consume_full
(count + full-column xxhash64/bit_xor checksum) under optional extra
session confs, reporting per-rep walls and the min. Runs in ONE fresh
session per invocation so conf experiments are isolated.

Usage:
    python tools/r16_probe.py q10_ship_delay q37_event_followups \
        [--reps 8] [--conf spark.sql.join.preferSortMergeJoin=false ...]
        [--noop]   # consume with the noop sink instead of the checksum
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("queries", nargs="+")
    ap.add_argument("--reps", type=int, default=8)
    ap.add_argument("--conf", action="append", default=[])
    ap.add_argument("--noop", action="store_true")
    args = ap.parse_args()

    extra = dict(c.split("=", 1) for c in args.conf)

    from cloud_native_medical_data_etl_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(
        app_name="r16-probe",
        master=f"local[{cpus}]",
        shuffle_partitions=int(cpus),
        extra_conf=extra,
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry_mod
    from bench import consume_full
    from cloud_native_medical_data_etl_pipeline_spark.operators.dedup import release

    queries = entry_mod.queries()

    # same warmup as bench.py: pay JVM/codegen/arrow first-use before timing
    from pyspark.sql import functions as _F

    for tbl in ("lineitem", "orders", "events", "documents", "embeddings"):
        try:
            entry_mod._t(spark, SF_DIR, tbl).limit(100).agg(
                _F.count(_F.lit(1))
            ).collect()
        except Exception:
            pass

    def consume(df):
        if args.noop:
            df.write.format("noop").mode("overwrite").save()
            return -1
        return consume_full(df)

    for name in args.queries:
        fn = queries[name]
        # untimed first execution (page/codegen ramp, bench parity)
        df = fn(spark, SF_DIR)
        consume(df)
        release(df)
        walls = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            n = consume(df)
            walls.append(round(time.perf_counter() - t0, 3))
            release(df)
        print(
            f"{name}: min={min(walls):.3f}s walls={walls} rows={n} "
            f"conf={extra or '-'} sink={'noop' if args.noop else 'checksum'}"
        )


if __name__ == "__main__":
    main()
