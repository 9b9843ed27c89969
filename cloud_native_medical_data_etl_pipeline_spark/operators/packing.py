"""Sequence packing: assemble variable-length documents into
fixed-token-budget training sequences (the "sample packing" step of an
LLM data pipeline).

Exact global first-fit-decreasing is inherently sequential, so the
scalable form is partition-local packing: documents are hash-bucketed
into independent packing groups, each group is packed greedily inside
one Arrow batch, and pack ids are made globally unique by prefixing
the group id. Packing quality is within a few percent of global FFD
once groups hold a few thousand docs (bin-packing waste concentrates
in the tail bins, one per group), while the plan is one narrow shuffle
of (key, n_tokens) plus a map pass — no global sort, no driver state,
unchanged at 100 TB.

Determinism: group assignment is a hash of the key (not a partition
index), and docs pack in (n_tokens desc, key) order within each group
— the same inputs produce the same packs on any cluster layout.

Two packers, one capacity story:

* ``pack_sequences`` — first-fit-decreasing bin packing inside hash
  groups (Arrow batch per group).  Best waste profile; bin membership
  is implementation-defined, so its correctness contract is the
  conservation-law invariants (every doc packed once, tokens
  conserved, no over-budget multi-doc bin), not a closed-form answer.
* ``pack_sequences_shelf`` — concat-and-split shelf packing: a
  closed-form prefix-sum assignment (window cumsum + integer divide)
  whose EXACT output any SQL engine reproduces.  This is the
  GPT-style pretraining layout (documents concatenated in a fixed
  order, the stream split every ``budget`` tokens); a document owns
  the shelf its first token lands in, so a boundary-straddling doc
  "overflows" its shelf on paper — at tokenization time the tail
  spills into the next sequence, which is precisely concat-split
  semantics.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    df: DataFrame,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    budget: int = 2048,
    num_groups: int | None = None,
    approx_docs: int | None = None,
    docs_per_group: int = 4096,
) -> DataFrame:
    """Assign each document a ``pack_id`` such that the sum of
    ``token_col`` within a pack never exceeds ``budget``.

    Documents longer than the budget get a singleton pack (the caller
    decides whether to truncate or drop them). Returns
    (key_col, token_col, pack_id string, pack_tokens long).

    Group sizing: pass ``num_groups`` directly, or ``approx_docs`` (a
    corpus-size hint, e.g. from catalog stats) to target
    ``docs_per_group`` docs per group. With neither, the corpus is
    COUNTED once to size groups — the count is metadata-only on plain
    parquet scans, and groups-per-slot alone would let group size
    scale with the corpus (1B docs / 1000 slots = 1M-row pandas
    frames per worker: OOM plus an O(n·bins) packing loop).  Pass one
    of the hints to skip the count job on derived frames.
    """
    if num_groups is None:
        if approx_docs is None:
            approx_docs = df.count()
        num_groups = max(1, approx_docs // docs_per_group)

    schema = T.StructType(
        [
            df.schema[key_col],
            T.StructField(token_col, T.LongType()),
            T.StructField("pack_id", T.StringType()),
            T.StructField("pack_tokens", T.LongType()),
        ]
    )

    def pack_group(pdf):
        import pandas as pd

        group = int(pdf["__grp"].iloc[0])
        # first-fit-decreasing, deterministic order; null token counts
        # count as 0 rather than crashing the Arrow batch
        rows = sorted(
            zip(pdf[key_col], pdf[token_col].fillna(0).astype("int64")),
            key=lambda r: (-r[1], r[0]),
        )
        # open bins: list of remaining capacities; linear scan first-fit
        # is O(n*bins) worst case; bins stay few because FFD fills them.
        # Oversized docs get remaining=-1: a CLOSED singleton bin that
        # nothing (not even a zero-token doc) can join, preserving the
        # "over budget implies singleton" invariant.
        remaining: list[int] = []
        assign: list[int] = []
        totals: list[int] = []
        for _key, tok in rows:
            placed = -1
            for i, rem in enumerate(remaining):
                if 0 <= tok <= rem:
                    placed = i
                    break
            if placed < 0:
                remaining.append(-1 if tok >= budget else budget - tok)
                totals.append(tok)
                placed = len(remaining) - 1
            else:
                remaining[placed] -= tok
                totals[placed] += tok
            assign.append(placed)
        return pd.DataFrame(
            {
                key_col: [k for k, _ in rows],
                token_col: [t for _, t in rows],
                "pack_id": [f"{group}-{b}" for b in assign],
                "pack_tokens": [totals[b] for b in assign],
            }
        )

    grouped = df.select(
        key_col,
        F.col(token_col).cast("long").alias(token_col),
        (F.abs(F.xxhash64(F.col(key_col))) % num_groups).alias("__grp"),
    )
    return grouped.groupBy("__grp").applyInPandas(pack_group, schema)


def pack_sequences_shelf(
    df: DataFrame,
    token_col: str = "n_tokens",
    key_col: str = "doc_id",
    budget: int = 2048,
    num_groups: int = 16,
    with_offset: bool = False,
) -> DataFrame:
    """Deterministic concat-and-split shelf packing.

    Within each md5-derived hash group, documents are laid out in
    ``key_col`` order as one contiguous token stream; the stream is
    cut every ``budget`` tokens and each document is assigned the
    shelf containing its FIRST token::

        shelf = (running_token_offset_before_doc) DIV budget

    Returns (key_col, token_col, pack_id string "<group>-<shelf>",
    pack_tokens long).  ``pack_tokens`` sums the tokens of the docs
    the shelf OWNS; the last owned doc may straddle the boundary, so
    a shelf can exceed ``budget`` by at most ``max_doc_len - 1``
    tokens — concat-split semantics, where the straddler's tail
    spills into the next training sequence at tokenization time.

    Why this exists next to ``pack_sequences``: the assignment is a
    closed-form expression (one window cumsum + an integer divide),
    so an external SQL engine reproduces it bit-for-bit — this is the
    oracle-checkable packer.  Group hashing uses the first 4 hex
    chars of md5 (the repo's engine-portable hash), NOT xxhash64,
    for the same reason.

    Scale shape: one shuffle on the group key + a per-group sort for
    the window — the same cost class as the FFD packer's
    applyInPandas, but with no Python worker in the path.  Size
    ``num_groups`` so a group's (key, n_tokens) pairs fit one task
    comfortably (the window state is a single running sum; only the
    sort is group-sized).

    ``with_offset=True`` appends ``pack_offset`` — the doc's starting
    token position INSIDE its shelf (start DIV budget picks the
    shelf, start MOD budget places the doc) — which a training data
    loader needs to materialize the sequence, and which makes the
    split test explicit: the doc straddles iff
    ``pack_offset + n_tokens > budget``.  Off by default so the q63
    oracle output stays byte-stable.

    NULL keys are the caller's responsibility: they hash to one NULL
    group whose within-group order is undefined (no deterministic
    contract survives a null sort key), and their ``pack_id`` is NULL
    — matching the SQL ``||`` null semantics, never a malformed
    group-less id.
    """
    from pyspark.sql import Window

    grp = (
        F.conv(F.substring(F.md5(F.col(key_col).cast("string")), 1, 4), 16, 10)
        .cast("long")
        % num_groups
    ).alias("__grp")
    base = df.select(
        F.col(key_col),
        # null token counts pack as 0 — same contract as the FFD
        # packer's fillna(0)
        F.coalesce(F.col(token_col).cast("long"), F.lit(0)).alias(token_col),
        grp,
    )
    w = (
        Window.partitionBy("__grp")
        .orderBy(key_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(token_col).over(w) - F.col(token_col)).alias("__start")
    shelved = base.select(key_col, token_col, "__grp", start).select(
        key_col,
        token_col,
        "__grp",
        "__start",
        F.expr(f"__start DIV {int(budget)}").alias("__shelf"),
    )
    pack_w = Window.partitionBy("__grp", "__shelf")
    out = [
        F.col(key_col),
        F.col(token_col),
        # concat, NOT concat_ws: a NULL key hashes to a NULL group and
        # must yield a NULL pack_id (the SQL `||` semantics the oracle
        # uses) — concat_ws would silently drop the null group and emit
        # a malformed group-less id like "0"
        F.concat(
            F.col("__grp").cast("string"),
            F.lit("-"),
            F.col("__shelf").cast("string"),
        ).alias("pack_id"),
        F.sum(token_col).over(pack_w).alias("pack_tokens"),
    ]
    if with_offset:
        out.append(F.pmod(F.col("__start"), F.lit(budget)).alias("pack_offset"))
    return shelved.select(*out)
