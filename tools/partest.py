#!/usr/bin/env python
"""Sharded test runner: the full pytest suite split across N worker
processes, each with its OWN SparkSession (pytest-xdist is not in the
container; Spark sessions cannot be shared across processes anyway).

Why: the suite is latency-bound — hundreds of small sequential Spark
jobs at ~0.1-0.3 s fixed cost each — so a single session gains nothing
from more cores (measured: test_classifier+test_components 107 s at
local[4] vs 113 s at local[16]).  Process-level sharding is the lever
that works: N independent sessions each drive their own job stream.

Sharding is PER FILE (conftest's session fixture binds one Spark
session per process; file granularity keeps module-scoped state
intact), greedy-packed by measured historical cost so the long files
don't land together.  Coverage is identical to `pytest tests/` by
construction — every test file appears in exactly one shard, worker
output is scanned for pass/fail counts, and the run FAILS unless the
summed pass count equals the serial suite's collection count.

Run: `python tools/partest.py [-n WORKERS]` (default 4).  Exit 0 iff
every shard exits 0 AND the collected-vs-passed reconciliation holds.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# measured per-file wall (seconds, serial r15 run) — used only as
# packing weights; unknown files default to the median.  Stale weights
# degrade balance, never correctness.
WEIGHTS = {
    "test_dedup_similarity.py": 220,
    "test_streaming.py": 130,
    "test_oracle.py": 260,
    "test_classifier.py": 75,
    "test_components.py": 75,
    "test_properties.py": 90,
    "test_pq.py": 80,
    "test_ivfpq.py": 70,
    "test_plans.py": 60,
    "test_ingest_sources.py": 60,
    "test_bpe.py": 55,
    "test_extension_oracle.py": 50,
}
DEFAULT_W = 25


def shard(files: list[str], n: int) -> list[list[str]]:
    loads = [0.0] * n
    out: list[list[str]] = [[] for _ in range(n)]
    for f in sorted(
        files, key=lambda p: -WEIGHTS.get(os.path.basename(p), DEFAULT_W)
    ):
        i = loads.index(min(loads))
        out[i].append(f)
        loads[i] += WEIGHTS.get(os.path.basename(f), DEFAULT_W)
    return [s for s in out if s]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("-n", "--workers", type=int, default=4)
    args = ap.parse_args()

    files = sorted(glob.glob(os.path.join(REPO, "tests", "test_*.py")))
    collected = subprocess.run(
        [sys.executable, "-m", "pytest", "tests/", "--collect-only", "-q"],
        cwd=REPO,
        capture_output=True,
        text=True,
    )
    # the reconciliation is the whole point: a failed or unparseable
    # collection pass must be a hard error, never a silent skip of the
    # passed==collected check (r15 review finding)
    m = re.search(r"(\d+) tests? collected", collected.stdout)
    if collected.returncode != 0 or m is None:
        print("COLLECTION FAILURE (exit "
              f"{collected.returncode}):\n{collected.stdout[-2000:]}")
        return 3
    want = int(m.group(1))
    print(f"collected {want} tests across {len(files)} files", flush=True)

    shards = shard(files, args.workers)
    t0 = time.time()
    procs = []
    for i, s in enumerate(shards):
        env = dict(os.environ)
        # each worker gets a modest core slice; the host has 32
        env.setdefault("TEST_SPARK_MASTER", "local[4]")
        # the sharded battery is the FULL suite: run the slow-marked
        # tests the default `pytest tests/` run skips (tests/conftest)
        env.setdefault("SPARK_GRAFT_RUN_SLOW", "1")
        env["SPARK_WAREHOUSE_DIR"] = f"/tmp/spark-warehouse-shard{i}"
        p = subprocess.Popen(
            [sys.executable, "-m", "pytest", "-q", "-p", "no:cacheprovider"]
            + [os.path.relpath(f, REPO) for f in s],
            cwd=REPO,
            env=env,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        procs.append((i, s, p))

    # skipped/xfailed/xpassed tests are accounted, not lost coverage —
    # the reconciliation compares passed+xpassed+skipped+xfailed
    # against the collection count, so a conditional skip can't fake a
    # false red and a lost test can't hide behind one (r15 finding);
    # xpassed counts as accounted because pytest exits 0 for it by
    # default — strictness is the xfail marker's job, not the runner's
    accounted, skipped_total, errors_total, failed = 0, 0, 0, []
    for i, s, p in procs:
        out, _ = p.communicate()
        tail = out.strip().splitlines()[-1] if out.strip() else ""
        print(f"shard {i} ({len(s)} files): {tail}", flush=True)
        for pat, is_skip in (
            # "N passed" can't accidentally match "N xpassed": the
            # required space before 'passed' excludes the 'x'
            (r"(\d+) passed", False),
            (r"(\d+) xpassed", False),
            (r"(\d+) skipped", True),
            (r"(\d+) xfailed", True),
        ):
            mp = re.search(pat, tail)
            if mp:
                accounted += int(mp.group(1))
                if is_skip:
                    skipped_total += int(mp.group(1))
        me = re.search(r"(\d+) error", tail)
        if me:
            errors_total += int(me.group(1))
        if p.returncode != 0:
            failed.append(i)
            print(out[-4000:], flush=True)

    wall = round(time.time() - t0, 1)
    print(
        f"accounted: {accounted} (expected {want}, "
        f"{skipped_total} skipped/xfailed); wall {wall}s"
    )
    if failed:
        # distinguish collection/setup errors from plain test failures
        # so this red says WHICH kind of problem to chase (r15 advice);
        # pytest exits nonzero on errors, so they always surface HERE,
        # never in the reconciliation branch below
        kind = (
            f" ({errors_total} collection/setup error(s))"
            if errors_total
            else ""
        )
        print(f"FAILED shards: {failed}{kind}")
        return 1
    if accounted != want:
        print(
            "RECONCILIATION FAILURE: passed+xpassed+skipped+xfailed "
            "!= collected (tests lost or summary line unparsed)"
        )
        return 2
    print("ALL SHARDS GREEN")
    return 0


if __name__ == "__main__":
    sys.exit(main())
