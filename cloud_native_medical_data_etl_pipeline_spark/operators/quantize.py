"""Embedding quantization for storage-scale vector corpora.

At 100 TB the embedding column IS the table: float32×D per row. The
standard storage answer is symmetric int8 — 4× smaller, recall loss
usually <1% for retrieval — with the scale kept per row so the
transform is a pure map-side expression: no corpus statistics pass,
no shuffle, quantization cost folds into the scan/write stage.

Everything is built from JVM-side array expressions (transform /
aggregate / array_max) — no UDFs — so the quantize step runs inside
whole-stage codegen and is reproducible across engines: the scale is
one exact division of exact doubles, and ROUND-half-away-from-zero
agrees between Spark (HALF_UP on positives/negatives) and C-family
round().
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _as_double(vec_col: str) -> Column:
    return F.transform(F.col(vec_col), lambda x: x.cast("double"))


def quantize_embeddings_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    round_dp: int = 6,
) -> DataFrame:
    """Row-wise symmetric int8 quantization.

    Per row: ``scale = max(|v_d|) / 127``; ``q_d = round(v_d /
    scale)`` — bounded in [-127, 127] by construction (|v_d| ≤
    max|v_d|), so no clipping branch exists to get wrong. The
    reconstruction error ``mean(|q_d·scale − v_d|)`` rides along so a
    pipeline can gate on quantization loss before committing the
    smaller table.

    Returns (key_col, scale, qvec array<int>, mean_abs_err). An
    all-zero vector has scale 0 and quantizes to zeros with zero
    error (the exact representation); empty/NULL vectors propagate
    NULLs.
    """
    v = _as_double(vec_col)
    amax = F.array_max(F.transform(v, F.abs))
    scale = amax / F.lit(127.0)
    # 0/0 is the all-zero vector: quantize to literal zeros, not NaN
    qvec = F.when(
        scale == 0, F.transform(v, lambda x: F.lit(0))
    ).otherwise(F.transform(v, lambda x: F.round(x / scale, 0).cast("int")))
    err = F.when(scale == 0, F.lit(0.0)).otherwise(
        F.aggregate(
            F.zip_with(qvec, v, lambda q, x: F.abs(q.cast("double") * scale - x)),
            F.lit(0.0),
            lambda acc, e: acc + e,
        )
        / F.size(v)
    )
    return df.select(
        F.col(key_col),
        F.round(scale, round_dp).alias("scale"),
        qvec.alias("qvec"),
        F.round(err, round_dp).alias("mean_abs_err"),
    )


def dequantize_int8(
    qvec_col: str = "qvec",
    scale_col: str = "scale",
) -> Column:
    """Reconstruction expression: ``q_d · scale`` as array<double> —
    compose into a select to materialize approximate vectors for
    downstream cosine/top-k without ever storing the float column."""
    return F.transform(
        F.col(qvec_col), lambda q: q.cast("double") * F.col(scale_col)
    )


# --- product quantization (PQ) ----------------------------------------------
#
# int8 buys 4x; product quantization buys 16-64x: split each vector
# into m subspaces, k-means each subspace independently (k codewords),
# store only the m one-byte codeword ids per vector.  Search uses
# asymmetric distance computation (ADC): per query, precompute the
# m x k lookup table of exact query-subvector -> codeword distances
# (driver-side, tiny), then every corpus row's approximate distance is
# m table lookups and a sum — pure column expressions over the m-byte
# codes; the float corpus is never read at query time.  This is the
# memory-bound ANN layout (Jegou et al., "Product Quantization for
# Nearest Neighbor Search", TPAMI 2011) and composes with the IVF cell
# index (IVF-PQ): prune cells by partition, rank in-cell by ADC.
#
# Determinism contract (same playbook as train_ivf_centroids):
# min-key init, fixed Lloyd iterations, per-iteration ROUNDED means,
# assignment on ROUNDED squared distances with lowest-index tiebreak
# (array_position(array_min)), left-to-right distance folds.


def _sub_slices(vec_col: str, m: int, dsub: int) -> list[Column]:
    return [
        F.slice(_as_double(vec_col), s * dsub + 1, dsub) for s in range(m)
    ]


def _lit_subvec(vals: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in vals])


def _sq_to_lit(sub: Column, cent: list[float]) -> Column:
    """Rounded squared L2 distance from a sub-vector column to a
    literal codeword — left-to-right fold, 9dp (the cross-engine
    ranking grain used by the similarity operators)."""
    return F.round(
        F.aggregate(
            F.zip_with(sub, _lit_subvec(cent), lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, v: acc + v,
        ),
        9,
    )


def _assign_code(sub: Column, codebook: list[list[float]]) -> Column:
    """Lowest-index argmin over the codebook, as ONE array column of
    rounded distances (linear expression tree — see assign_cells)."""
    d = F.array(*[_sq_to_lit(sub, c) for c in codebook])
    return (F.array_position(d, F.array_min(d)) - 1).cast("int")


def _fps_seed_books(
    base: DataFrame, m: int, k: int
) -> list[list[list[float]]]:
    """Deterministic farthest-point seeding, per subspace, all m
    subspaces per scan.

    Seed 0 is the min-key row's subvector (same seedless rule as
    `train_ivf_centroids` / `kcenter_select`); each later hop picks,
    independently per subspace, the subvector maximizing the ROUNDED
    min squared distance to the codewords chosen so far (ascending-key
    tiebreak via min-of-struct on (-dist, key)).  One aggregate scan
    per hop computes all m argmaxes — k-1 scans total over the cached
    (key, v0..v{m-1}) frame, zero shuffle.

    Farthest-point spread is what makes Lloyd converge here: the old
    first-k-rows init put every seed inside one cluster for clustered
    data (the r6 defect).  A subspace whose max min-distance reaches
    0.0 has fewer than k distinct subvectors — remaining slots pad
    with copies of codeword 0, harmless under the lowest-index argmin
    used by `_assign_code` (so n < k inputs no longer crash: ADVICE
    r6).
    """
    seed = base.orderBy(F.col("key").asc()).limit(1).collect()[0]
    books = [[[float(x) for x in seed[f"v{s}"]]] for s in range(m)]
    done = [False] * m
    for _ in range(k - 1):
        if all(done):
            break
        aggs = []
        for s in range(m):
            dmin = F.array_min(
                F.array(
                    *[_sq_to_lit(F.col(f"v{s}"), c) for c in books[s]]
                )
            )
            aggs.append(
                F.min(
                    F.struct(
                        (-dmin).alias("nd"),
                        F.col("key").alias("key"),
                        F.col(f"v{s}").alias("v"),
                    )
                ).alias(f"far{s}")
            )
        far = base.agg(*aggs).collect()[0]
        for s in range(m):
            if done[s]:
                books[s].append(books[s][0])
                continue
            hit = far[f"far{s}"]
            if hit is None or hit["nd"] == 0.0:
                done[s] = True
                books[s].append(books[s][0])
            else:
                books[s].append([float(x) for x in hit["v"]])
    for s in range(m):
        while len(books[s]) < k:
            books[s].append(books[s][0])
    return books


def pq_train(
    df: DataFrame,
    m: int = 8,
    k: int = 16,
    vec_col: str = "embedding",
    key_col: str = "vec_id",
    iters: int = 4,
    round_dp: int = 6,
) -> list[list[list[float]]]:
    """Train per-subspace codebooks: returns m lists of k codewords of
    dim/m doubles each.

    Init is deterministic farthest-point seeding per subspace
    (`_fps_seed_books`).  Each Lloyd iteration runs ONE map pass
    assigning all m subspaces at once (m argmin expression batteries
    over the same scan) and ONE (subspace, code, pos)-keyed mean
    aggregate — map-side combinable, m*k*dsub output rows collected to
    the driver (the codebook is metadata-sized by construction).
    Codewords that lose all members keep their previous value, so k
    never shrinks.  The (key, subvectors) projection is materialized
    once (localCheckpoint) and shared by the k-1 seeding scans and the
    `iters` Lloyd passes.  At 100 TB, train on a hash-sample (the
    codebook is a statistic, not a transform) and encode the full
    corpus with `pq_encode`.
    """
    probe = df.where(F.col(vec_col).isNotNull()).select(vec_col).first()
    if probe is None:
        return []
    dim = len(probe[0])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    dsub = dim // m
    slices = _sub_slices(vec_col, m, dsub)
    base = (
        df.where(F.col(vec_col).isNotNull())
        .select(
            F.col(key_col).alias("key"),
            *[slices[s].alias(f"v{s}") for s in range(m)],
        )
        .localCheckpoint()
    )
    books = _fps_seed_books(base, m, k)
    for _ in range(iters):
        tagged = base.select(
            *[
                c
                for s in range(m)
                for c in (
                    _assign_code(F.col(f"v{s}"), books[s]).alias(f"c{s}"),
                    F.col(f"v{s}").alias(f"w{s}"),
                )
            ]
        )
        # one unpivoted (subspace, code, pos, val) frame -> one agg
        stacked = tagged.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(s).alias("s"),
                            F.col(f"c{s}").alias("code"),
                            F.col(f"w{s}").alias("sub"),
                        )
                        for s in range(m)
                    ]
                )
            ).alias("x")
        ).select(
            F.col("x.s").alias("s"),
            F.col("x.code").alias("code"),
            F.posexplode("x.sub").alias("pos", "val"),
        )
        rows = (
            stacked.groupBy("s", "code", "pos")
            .agg(F.round(F.avg("val"), round_dp).alias("mv"))
            .collect()
        )
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in rows:
            got.setdefault((r["s"], r["code"]), {})[r["pos"]] = r["mv"]
        books = [
            [
                [got[(s, c)][p] for p in range(dsub)]
                if (s, c) in got
                else books[s][c]
                for c in range(k)
            ]
            for s in range(m)
        ]
    return books


def pq_encode(
    df: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    key_col: str = "vec_id",
) -> DataFrame:
    """``(key, pq_code array<int>)`` — m codeword ids per vector, one
    map pass, codebooks inlined as literals.  At dim=64, m=8, k<=256
    the stored code is 8 bytes vs 256 for float32: 32x smaller."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    subs = _sub_slices(vec_col, m, dsub)
    return df.where(F.col(vec_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.array(
            *[_assign_code(subs[s], codebooks[s]) for s in range(m)]
        ).alias("pq_code"),
    )


def pq_reconstruct(
    encoded: DataFrame, codebooks: list[list[list[float]]]
) -> DataFrame:
    """Decode codes back to the quantized vector (concatenated
    codewords) — the error-measurement companion: join-free, the
    codebooks ride as literal array-of-array columns."""
    books = [
        F.array(*[_lit_subvec(c) for c in book]) for book in codebooks
    ]
    return encoded.select(
        "key",
        F.flatten(
            F.array(
                *[
                    F.element_at(
                        books[s], F.col("pq_code")[s] + 1
                    )
                    for s in range(len(codebooks))
                ]
            )
        ).alias("vec_hat"),
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    round_dp: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k: exact query-subvector -> codeword
    distance tables computed once driver-side (m x k floats),
    broadcast as literals; each corpus row costs m element_at lookups
    + a sum.  Returns (key, adc_dist) ascending, key tiebreak.

    The float corpus is NEVER scanned — only the m-byte codes — which
    is the point: at 100 TB the code table is 1/32nd the bytes, and
    the scan is the cost.  Composes with the IVF index for cell
    pruning (IVF-PQ)."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    if len(query_vec) != m * dsub:
        raise ValueError(
            f"query dim {len(query_vec)} != codebook dim {m * dsub}"
        )
    luts = []
    for s in range(m):
        qs = [float(x) for x in query_vec[s * dsub : (s + 1) * dsub]]
        luts.append(
            [
                round(sum((a - b) * (a - b) for a, b in zip(qs, c)), 9)
                for c in codebooks[s]
            ]
        )
    score = F.lit(0.0)
    for s in range(m):
        score = score + F.element_at(
            F.array(*[F.lit(v) for v in luts[s]]), F.col("pq_code")[s] + 1
        )
    return (
        encoded.select(
            "key", F.round(score, round_dp).alias("adc_dist")
        )
        .orderBy(F.col("adc_dist").asc(), F.col("key").asc())
        .limit(k)
    )
