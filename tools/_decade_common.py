"""Shared Spark REST stage-metric scraping for the tools/*_decade.py
evidence harnesses.

Every decade harness measures the same way: cumulative completed-stage
metrics from the status REST API, deltas around a timed block.  One
copy here instead of one per harness, so a fix (a renamed REST field,
counting failed stages, a new metric) lands everywhere at once.
"""

from __future__ import annotations

import json
import urllib.request


def api(spark, path):
    """GET a status REST endpoint for the live application."""
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{path}") as r:
        return json.load(r)


def stages_by_id(spark):
    """All completed stages keyed by stageId (for per-stage diffing)."""
    return {st["stageId"]: st for st in api(spark, "stages?status=complete")}


def stage_totals(spark):
    """Cumulative input/shuffle totals over all completed stages."""
    tot = {
        "inputBytes": 0,
        "inputRecords": 0,
        "shuffleRead": 0,
        "shuffleWrite": 0,
    }
    for st in api(spark, "stages?status=complete"):
        tot["inputBytes"] += st.get("inputBytes", 0)
        tot["inputRecords"] += st.get("inputRecords", 0)
        tot["shuffleRead"] += st.get("shuffleReadBytes", 0)
        tot["shuffleWrite"] += st.get("shuffleWriteBytes", 0)
    return tot


def delta(before, after):
    """Per-key difference of two stage_totals() snapshots."""
    return {k: after[k] - before[k] for k in before}
