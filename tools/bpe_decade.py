#!/usr/bin/env python
"""Measured evidence for the BPE operator family (r14 —
`operators/bpe.py`; staged q143).

Two claims under test:

1. TRAIN cost tracks the corpus only through the one word-count
   aggregate; the merge loop runs on the vocabulary-sized frequency
   table.  Replicating the corpus 10× (exact copies, shifted ids)
   multiplies every pair count by exactly 10 and leaves the
   vocabulary unchanged — so the merge SEQUENCE must be identical
   with counts ×10 (asserted mechanically: greedy argmax is
   scale-invariant), and train wall must grow far slower than 10×.
2. APPLY (encoding) is a map-side JVM fold chain: throughput in
   encoded tokens/s holds across the decade (per-doc work only).

Run: `python tools/bpe_decade.py` (one JSON line to stdout).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from cloud_native_medical_data_etl_pipeline_spark.operators.bpe import (  # noqa: E402
    apply_bpe_merges,
    train_bpe_merges,
)
from cloud_native_medical_data_etl_pipeline_spark.session import get_spark  # noqa: E402

SF_DIR = "/root/testdata/sf0.1"
NUM_MERGES = 8
REPS = 2


def _timed(fn):
    fn()
    walls = []
    for _ in range(REPS):
        t0 = time.perf_counter()
        res = fn()
        walls.append(time.perf_counter() - t0)
    return round(min(walls), 3), res


def main():
    import shutil
    import tempfile

    spark = get_spark(master="local[32]", shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "text"
    )
    n1 = docs.count()
    root = tempfile.mkdtemp(prefix="bpe_decade_")
    results = {}
    merge_tables = {}
    try:
        # exact replicas (same text, shifted ids): every pair count
        # scales by the factor, the vocabulary does not change
        for label, factor in (("1x", 1), ("10x", 10)):
            parts = [
                docs.select(
                    (F.col("doc_id") + F.lit(i * n1)).alias("doc_id"), "text"
                )
                for i in range(factor)
            ]
            from functools import reduce

            corpus_path = f"{root}/{label}"
            reduce(lambda a, b: a.unionByName(b), parts).write.mode(
                "overwrite"
            ).parquet(corpus_path)
            # repartition before the CPU-bound stages: the interpreted
            # higher-order fold chain (apply) and the tokenize+explode
            # (train's word count) inherit the scan's split count, and
            # a compact corpus arrives as few splits — the same lever
            # tools/mm_decade.py measures for the decode path
            corpus = spark.read.parquet(corpus_path).repartition(32)

            train_wall, merges = _timed(
                lambda c=corpus: [
                    tuple(r)
                    for r in train_bpe_merges(c, num_merges=NUM_MERGES)
                    .orderBy("step")
                    .collect()
                ]
            )
            merge_tables[label] = merges
            rules = [(m[1], m[2]) for m in merges]

            def run_apply(c=corpus, rules=rules):
                row = (
                    apply_bpe_merges(c, rules)
                    .agg(
                        F.count(F.lit(1)).alias("docs"),
                        F.sum("n_bpe_tokens").alias("toks"),
                        F.bit_xor(F.xxhash64("n_bpe_tokens")).alias("c"),
                    )
                    .first()
                )
                return int(row["docs"]), int(row["toks"])

            apply_wall, (docs_out, toks) = _timed(run_apply)
            assert docs_out == n1 * factor, (label, docs_out)
            results[label] = {
                "docs": n1 * factor,
                "train_wall_sec": train_wall,
                "apply_wall_sec": apply_wall,
                "encoded_tokens": toks,
                "encoded_tokens_per_sec": round(toks / apply_wall),
            }
            print(f"  {label}: {results[label]}", file=sys.stderr)

        # the scale-invariance assert: same merge sequence, counts x10
        m1, m10 = merge_tables["1x"], merge_tables["10x"]
        assert [(s, l, r) for s, l, r, _ in m1] == [
            (s, l, r) for s, l, r, _ in m10
        ], (m1, m10)
        assert all(
            c10 == 10 * c1
            for (_, _, _, c1), (_, _, _, c10) in zip(m1, m10)
        ), (m1, m10)
        results["merge_sequence"] = [
            {"step": s, "left": l, "right": r, "count_1x": c}
            for s, l, r, c in m1
        ]
        # train wall must not track the corpus linearly (the loop runs
        # on the unchanged vocabulary; only the word count sees 10x)
        assert (
            results["10x"]["train_wall_sec"]
            < 5 * results["1x"]["train_wall_sec"]
        ), results
        # encode throughput holds within the linear-scaling band
        assert (
            results["10x"]["encoded_tokens_per_sec"]
            > 0.5 * results["1x"]["encoded_tokens_per_sec"]
        ), results
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(json.dumps({"bpe_decade": results}))


if __name__ == "__main__":
    main()
