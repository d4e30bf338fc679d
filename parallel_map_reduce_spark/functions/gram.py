"""The ONE sequential-fold cosine Gram kernel shared by every
embedding pair generator (LSH bucket kernel, blocked exact tier,
cluster-sharded SemDeDup) — extracted in round 7 from three hand-copies
so a numeric change can never apply to one copy and not the others.

Numeric contract (the reason this exists): dot products and norms
accumulate SEQUENTIALLY over dimensions — an explicit per-dimension
outer-product loop, never a BLAS matmul — so every pair's cosine is
bit-identical to the JVM fold (functions/vectors.py: F.aggregate in
dimension order) and DuckDB's list_* folds. The audit queries hash
SUM(round(sim, 6) * 1e6) against DuckDB oracles; a pairwise-summation
matmul could flip a 6-decimal rounding at the boundary. Division and
rounding order also match the JVM expression: fold the raw dot, THEN
divide by the norm product, THEN round — not normalize-then-dot.

Blocking: pair emission iterates over ``block``-sized tiles of the
Gram matrix, so peak kernel memory is O(block² + n·dim) regardless of
group occupancy — each tile entry's fold is arithmetic-identical to
the unblocked kernel's, so blocking changes memory, never values.
"""

from __future__ import annotations

import numpy as np

# Tile edge for pair emission: 2048² float64 tiles are ~32 MB for the
# gram + sims copies — comfortably inside an Arrow worker's budget even
# with a few tiles' temporaries, while big enough that tiny groups
# (the common case: LSH buckets, balanced clusters) run in one tile.
DEFAULT_BLOCK = 2048


def seq_norms(mat: np.ndarray) -> np.ndarray:
    """L2 norms accumulated in dimension order (n² = ((0+x0²)+x1²)+…),
    matching the JVM/DuckDB fold exactly."""
    n2 = np.zeros(mat.shape[0])
    for d in range(mat.shape[1]):
        n2 += mat[:, d] * mat[:, d]
    return np.sqrt(n2)


def seq_gram(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Dot-product matrix accumulated in dimension order — each element
    g[i,j] folds ((0 + x0·y0) + x1·y1) + … exactly as before. The fold
    runs over row-chunks of the accumulator sized to stay cache-resident
    (~256 KB) across the whole dimension loop: the naive form streams the
    full m×n accumulator from DRAM once per dimension (dim × m×n×8 bytes
    of traffic), the chunked form touches DRAM O(m×n) once. Chunking by
    rows never reorders any element's additions, so values are
    bit-identical (pytest-pinned against the unchunked fold); measured
    3.0× on a 2048² tile at dim=64."""
    m, n = a.shape[0], b.shape[0]
    g = np.empty((m, n))
    # dim-major copies: the per-dimension column slices below are then
    # contiguous reads instead of stride-dim gathers
    at = np.ascontiguousarray(a.T)
    bt = np.ascontiguousarray(b.T)
    ch = max(1, (256 << 10) // max(8 * n, 1))
    tmp = np.empty((min(ch, m), n))
    for i0 in range(0, m, ch):
        i1 = min(i0 + ch, m)
        sub = np.zeros((i1 - i0, n))
        t = tmp[: i1 - i0]
        for d in range(a.shape[1]):
            np.multiply(at[d, i0:i1, None], bt[d][None, :], out=t)
            sub += t
        g[i0:i1] = sub
    return g


def cosine_pairs(
    ids_l: np.ndarray,
    mat_l: np.ndarray,
    threshold: float,
    ids_r: np.ndarray | None = None,
    mat_r: np.ndarray | None = None,
    block: int = DEFAULT_BLOCK,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(ia, ib, sims): every pair with ROUND(cos, 6) >= threshold.

    One-matrix form (ids_r is None): upper-triangle pairs (i < j by
    POSITION; callers canonicalize id order with min/max as before).
    Two-matrix form: the full left×right cross product.

    Zero-norm vectors get a denominator of 1.0 (sim = 0 against
    everything), the shared guard all three former copies carried.
    """
    nl = seq_norms(mat_l)
    if ids_r is None:
        ids_r, mat_r, nr, tri = ids_l, mat_l, nl, True
    else:
        nr, tri = seq_norms(mat_r), False
    out_a, out_b, out_s = [], [], []
    for i0 in range(0, len(ids_l), block):
        i1 = min(i0 + block, len(ids_l))
        # triangular case: tiles strictly below the diagonal band hold
        # only j <= i entries — skip them instead of masking them
        j_start = i0 if tri else 0
        for j0 in range(j_start, len(ids_r), block):
            j1 = min(j0 + block, len(ids_r))
            g = seq_gram(mat_l[i0:i1], mat_r[j0:j1])
            denom = np.outer(nl[i0:i1], nr[j0:j1])
            sims = np.round(g / np.where(denom == 0, 1.0, denom), 6)
            keep = sims >= threshold
            if tri:
                # positional upper triangle in GLOBAL indices: j > i
                gi = np.arange(i0, i1)[:, None]
                gj = np.arange(j0, j1)[None, :]
                keep &= gj > gi
            ii, jj = np.nonzero(keep)
            if len(ii):
                out_a.append(ids_l[i0 + ii])
                out_b.append(ids_r[j0 + jj])
                out_s.append(sims[ii, jj])
    if not out_a:
        e = np.array([], dtype="int64")
        return e, e.copy(), np.array([], dtype="float64")
    return (
        np.concatenate(out_a),
        np.concatenate(out_b),
        np.concatenate(out_s),
    )
