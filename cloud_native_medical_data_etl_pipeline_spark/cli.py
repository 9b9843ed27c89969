"""CLI entry points mirroring the reference's transformer and
quality-checker mains (drug_transformer.py:355-366,
data_quality.py:299-322), for spark-submit.

  python -m cloud_native_medical_data_etl_pipeline_spark.cli transform \
      --date 2024-01-15 --input-base <lake> --output-base <lake>
  python -m cloud_native_medical_data_etl_pipeline_spark.cli quality \
      --date 2024-01-15 --base <lake>        # exit 0/1 contract
"""

from __future__ import annotations

import argparse
import json
import sys

from . import schemas
from .operators import quality
from .plans import pipeline
from .session import get_spark
from .sources import lake


def _cmd_transform(args) -> int:
    spark = get_spark(app_name=f"transform-{args.date}")
    fda = lake.read_partition(
        spark, f"{args.input_base}/raw/fda", args.date, schema=schemas.FDA_EVENTS,
        fmt="json",
    )
    ct = lake.read_partition(
        spark, f"{args.input_base}/raw/clinicaltrials", args.date,
        schema=schemas.CLINICAL_TRIALS, fmt="json",
    )
    try:
        result = pipeline.run(
            spark,
            args.date,
            fda if fda.take(1) else None,
            ct if ct.take(1) else None,
            args.output_base,
        )
    except ValueError as exc:
        # a day with BOTH raw partitions empty raises from
        # enrich.enrich — honor the JSON-line + exit-code contract the
        # way backfill's per-day isolation does, instead of dumping a
        # raw traceback
        result = pipeline.RunResult(
            date=args.date, status=f"error: {exc}"[:200]
        )
    print(json.dumps(result.__dict__, default=str))
    return 0 if result.status == "success" else 1


def _cmd_quality(args) -> int:
    spark = get_spark(app_name=f"quality-{args.date}")
    df = lake.read_partition(spark, f"{args.base}/processed", args.date)
    cfg = quality.load_quality_config(args.config) if args.config else None
    report = quality.run_quality_checks(df, args.date, config=cfg)
    print(json.dumps(report, indent=2, default=str))
    return 0 if report["overall_passed"] else 1


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="medical-etl-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("transform", help="daily transform+enrich+save")
    t.add_argument("--date", required=True)
    t.add_argument("--input-base", required=True)
    t.add_argument("--output-base", required=True)
    t.set_defaults(fn=_cmd_transform)

    q = sub.add_parser("quality", help="six-check quality gate, exit 0/1")
    q.add_argument("--date", required=True)
    q.add_argument("--base", required=True)
    q.add_argument(
        "--config",
        default=None,
        help="pipeline config file; its quality: section overrides "
        "thresholds (pipeline_config.yaml:42-63 keys)",
    )
    q.set_defaults(fn=_cmd_quality)

    args = parser.parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
