"""Change-data-capture application: fold an insert/update/delete log
into a base snapshot — the lakehouse MERGE, as a plain plan.

Semantics: for each key, the LATEST change (by change time, ties by a
caller-supplied unique id) wins.  A latest 'D' removes the key; a
latest 'I'/'U' replaces (or inserts) the payload; keys with no change
keep their base row.  Earlier changes for a key are irrelevant by
construction — last-writer-wins, the same contract Delta/Iceberg
MERGE implements per commit.

Scale shape: ONE key-hash shuffle over the (typically small) change
log for the latest-per-key window, then one shuffle joining base and
survivors on the key — with AQE broadcasting the change side when the
log is small, which is the common nightly-CDC case.  Nothing scans
the base twice and nothing is ordered globally.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def apply_cdc(
    base: DataFrame,
    changes: DataFrame,
    key_col: str,
    ts_col: str,
    op_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Return the post-merge snapshot (base's columns).

    ``changes`` carries the key, the op ('I'/'U'/'D'), the change
    time, the tiebreak id, and the base's payload columns (ignored —
    may be NULL — for 'D' rows).  Unknown op values and NULL keys
    raise at execution rather than silently dropping rows (a NULL key
    in a keyed merge is malformed: the latest-per-key window GROUPS
    nulls while the anti-join's SQL equality never matches them, so
    admitting it would mix semantics — one surviving null-key upsert
    appended next to every null-key base row).  Note that Catalyst
    may reorder a caller's own pre-filter relative to this check, so
    "filter the bad rows out upstream" is not a reliable way to admit
    malformed ops — the contract is that EVERY row in ``changes``
    carries a valid op (materialize a cleaned frame first if the
    source can't guarantee it).
    """
    payload_cols = [c for c in base.columns]

    # fail loud on ops outside the contract BEFORE the window: a
    # typo'd 'u' that loses the latest-per-key race would otherwise be
    # filtered away unseen.  The check lives in a FILTER (always true
    # or raising) — an unused projected column would be pruned away by
    # Catalyst, check and all
    changes = changes.where(
        F.when(
            F.col(op_col).isin("I", "U", "D") & F.col(key_col).isNotNull(),
            F.lit(True),
        ).otherwise(
            F.raise_error(
                F.concat(
                    F.lit("apply_cdc: unknown op or NULL key ("),
                    F.coalesce(F.col(op_col), F.lit("NULL")),
                    F.lit(", key="),
                    F.coalesce(F.col(key_col).cast("string"), F.lit("NULL")),
                    F.lit(")"),
                )
            )
        )
    )
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).desc(), F.col(tiebreak_col).desc()
    )
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )

    touched = latest.select(key_col)
    survivors = base.join(touched, key_col, "left_anti")
    upserts = latest.where(F.col(op_col) != "D").select(*payload_cols)
    return survivors.unionByName(upserts)
