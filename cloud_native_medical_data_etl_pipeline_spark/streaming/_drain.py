"""Shared availableNow → memory-sink drain.

Every *_available_now operator needs the same boilerplate: a unique
in-session query name, ``writeStream.format("memory")`` with an
availableNow trigger, start + awaitTermination, then read the sink
table back.  Before this helper the block was copy-pasted six times
across anomaly.py / events.py / sessions.py with three separate
module-global counters — one definition keeps naming, error handling,
and any future cleanup in one place.
"""

from __future__ import annotations

import itertools

from pyspark.sql import DataFrame

# itertools.count.__next__ is atomic under the GIL — safe across the
# driver threads a test harness may use
_seq = itertools.count(1)


def drain_to_memory(df: DataFrame, prefix: str, output_mode: str) -> DataFrame:
    """Run the streaming frame ``df`` to completion into a uniquely
    named in-memory sink and return the sink table."""
    name = f"{prefix}_{next(_seq)}"
    q = (
        df.writeStream.outputMode(output_mode)
        .format("memory")
        .queryName(name)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return df.sparkSession.table(name)
