"""Driver-side numpy replica of the deterministic PQ trainer.

`quantize.pq_train(engine="sql")` is the cross-engine SPEC: every
arithmetic step (left-to-right squared-distance folds, 9dp-rounded
distances and priorities, 6dp-rounded Lloyd means, md5-seeded D²
races, lowest-index/min-key tiebreaks) is expressible in plain SQL,
and the DuckDB oracles replay it CTE-for-CTE (q137/q138).  But as an
in-engine loop it costs k-1 driver round-trips whose expression
batteries grow with the codebook — plan-compile-bound at the k=256
regime PQ normally runs at, regardless of data size.

This module is the PRODUCTION path for the same contract: codebooks
are driver-side METADATA by construction, and training input is
already capped by the deterministic md5 hash-sample
(`_sampling.hash_sample`), so the sampled training frame is collected
ONCE and seeding + Lloyd run here in numpy — O(1) Spark jobs, O(n·k·
dsub) numpy work, identical results (unit-pinned against the SQL
engine in tests/test_pq.py).  Every rounding below deliberately
mirrors the Spark expression it replaces; rounding at dp>0 cannot hit
a decimal midpoint with binary doubles, so HALF_UP (Spark) and
HALF_EVEN (numpy) agree on all reachable values.
"""

from __future__ import annotations

import hashlib

import numpy as np


def md5_uniform_py(key: object, salt: str = "") -> float:
    """Driver-side replica of `_sampling.md5_uniform`: (first 8 hex
    digits of md5(salt || key) + 1) / 2^32, key stringified the way
    Spark casts it (ints print bare, matching ``CAST(key AS STRING)``)."""
    h = hashlib.md5((salt + str(key)).encode("utf-8")).hexdigest()[:8]
    return (int(h, 16) + 1.0) / 4294967296.0


_MAGIC = 6755399441055744.0  # 1.5 * 2^52


def _round9(a: np.ndarray) -> np.ndarray:
    """``np.round(a, 9)``, bitwise-identical, without np.rint: scale by
    1e9, round half-even via the 2^52 magic-constant add/subtract
    (exact for |scaled| < 2^51), unscale.  This numpy build's
    rint/floor take a non-SIMD libm path (~0.6 µs/element — it made
    rounding 84% of a 100k-row k=256 training); the magic add is
    ~125× faster and proven bitwise-equal on the reachable range.
    Values with |scaled| ≥ 2^51 (impossible for the bounded distances
    and (0,1] priorities here, but guarded anyway) fall back to
    np.rint lane-wise."""
    t = a * 1e9
    # one max-reduction guard (False on NaN → fallback), not a per-lane
    # mask: the mask's abs/compare/invert/any cost 4 extra array passes
    # and dominated the rounding itself
    if not bool(np.max(np.abs(t), initial=0.0) < 2**51):
        # rare lane, also entered on NaN (the max comparison is False)
        big = ~(np.abs(t) < 2**51)
        t += _MAGIC
        t -= _MAGIC
        t[big] = np.rint(
            np.asarray(a, dtype=np.float64)[big] * 1e9
        )
        t /= 1e9
        return t
    t += _MAGIC
    t -= _MAGIC
    t /= 1e9
    return t


def _d2_round9(X: np.ndarray, cw: list[float] | np.ndarray) -> np.ndarray:
    """Rounded squared L2 distance from every row of X to one codeword
    — the exact arithmetic of `quantize._fold_sq`: acc starts at 0.0
    and adds each (x_d - y_d)² LEFT TO RIGHT, then rounds to 9dp."""
    acc = np.zeros(X.shape[0])
    for d in range(X.shape[1]):
        t = X[:, d] - cw[d]
        acc = acc + t * t
    return _round9(acc)


def _d2_matrix(X: np.ndarray, book: list[list[float]]) -> np.ndarray:
    """(n, k) rounded distances to every codeword, accumulated DIM BY
    DIM over (row-chunk × codewords) blocks: each element's sum is
    the same left-to-right fold as `_d2_round9` (0 + t₀² + t₁² + …,
    in-place add included), so values are identical — but the work
    runs as dsub passes over cache-sized blocks instead of k·dsub
    whole-column passes (k× less call overhead) or dsub full-matrix
    passes (whose n×k temporaries are memory-bandwidth-bound at a
    10⁵-row, k=256 sample)."""
    C = np.asarray(book, dtype=np.float64)
    n, k = X.shape[0], C.shape[0]
    out = np.empty((n, k))
    step = max(1, (1 << 22) // max(k, 1))  # ~4M-double blocks
    for lo in range(0, n, step):
        Xb = X[lo : lo + step]
        acc = np.zeros((Xb.shape[0], k))
        t = np.empty_like(acc)
        for d in range(X.shape[1]):
            np.subtract(Xb[:, d, None], C[None, :, d], out=t)
            np.multiply(t, t, out=t)
            acc += t
        out[lo : lo + step] = _round9(acc)
    return out


def _seed_book(
    X: np.ndarray, u: np.ndarray, k: int
) -> list[list[float]]:
    """`quantize._kmeanspp_seed_books`, one subspace: seed 0 is the
    min-key row (rows arrive key-sorted, so row 0); each later hop
    holds an Efraimidis-Spirakis race — priority = round(u **
    (1/dmin), 9) where dmin is the ROUNDED min squared distance to the
    codewords so far, candidates need priority > 0, max priority wins,
    min key breaks ties (first occurrence on key-sorted rows).  A hop
    with no candidate marks the subspace done; its remaining slots pad
    with copies of codeword 0 (memberless under the lowest-index
    argmin, re-synced by every Lloyd refill — nothing drifts)."""
    book = [[float(x) for x in X[0]]]
    dmin = _d2_round9(X, X[0])
    done = False
    for _ in range(k - 1):
        if done:
            book.append(list(book[0]))
            continue
        with np.errstate(over="ignore", under="ignore"):
            pri = np.where(
                dmin > 0,
                _round9(u ** (1.0 / np.where(dmin > 0, dmin, 1.0))),
                -1.0,
            )
        cand = pri > 0
        if not cand.any():
            done = True
            book.append(list(book[0]))
            continue
        i = int(np.argmax(np.where(cand, pri, -np.inf)))
        book.append([float(x) for x in X[i]])
        # incremental min == the SQL battery's array_min over all
        # codewords: per-codeword distances are rounded before the min
        dmin = np.minimum(dmin, _d2_round9(X, X[i]))
    return book


def _refill_empty(
    X: np.ndarray,
    book: list[list[float]],
    empties: list[int],
) -> list[list[float]]:
    """`quantize._refill_empty_cells`, one subspace: each empty slot
    takes the point FARTHEST from the just-updated codebook (rounded
    min distance, min-key tiebreak), distances FROZEN at the post-mean
    codebook, already-used points excluded; once nothing refillable
    remains (dmin == 0 everywhere left), this and all later empty
    slots re-sync to codeword 0's current value."""
    if not empties:
        return book
    dmin = _d2_matrix(X, book).min(axis=1)
    used = np.zeros(X.shape[0], dtype=bool)
    todo = list(empties)
    while todo:
        c = todo.pop(0)
        ok = (dmin > 0) & ~used
        if not ok.any():
            for cc in [c] + todo:
                book[cc] = list(book[0])
            break
        i = int(np.argmax(np.where(ok, dmin, -np.inf)))
        book[c] = [float(x) for x in X[i]]
        used[i] = True
    return book


def pq_train_np(
    rows: list,
    m: int,
    k: int,
    dsub: int,
    iters: int,
    round_dp: int,
) -> list[list[list[float]]]:
    """Full trainer over the collected (key, v0..v{m-1}) frame:
    key-sort (Spark's orderBy on the same values), then per subspace
    k-means++ seeding + `iters` Lloyd rounds — assignment by
    lowest-index argmin over ROUNDED distances, means ROUNDED to
    ``round_dp`` (Spark's F.avg and numpy's mean sum in different
    orders; both land on the same 1e-6-grain value, which is the whole
    point of the rounded-statistic contract in `_iterate`), empty
    slots refilled per `_refill_empty`.  Subspaces never interact, so
    the SQL path's batched per-scan aggregates and this per-subspace
    loop compute identical books."""
    rows = sorted(rows, key=lambda r: r["key"])
    keys = [r["key"] for r in rows]
    books: list[list[list[float]]] = []
    for s in range(m):
        X = np.array([r[f"v{s}"] for r in rows], dtype=np.float64)
        u = np.array(
            [md5_uniform_py(key, f"kpp{s}:") for key in keys]
        )
        book = _seed_book(X, u, k)
        for _ in range(iters):
            codes = np.argmin(_d2_matrix(X, book), axis=1)
            empties: list[int] = []
            newbook: list[list[float]] = []
            for c in range(k):
                members = codes == c
                if members.any():
                    newbook.append(
                        [
                            float(x)
                            for x in np.round(
                                X[members].mean(axis=0), round_dp
                            )
                        ]
                    )
                else:
                    newbook.append(list(book[c]))
                    empties.append(c)
            book = _refill_empty(X, newbook, empties)
        books.append(book)
    return books
