"""Pallas exact k-nearest-neighbors kernel (TPU).

The dense XLA kNN (ops/neighbors.py) materializes (block, P) distance
matrices in HBM and re-reads them once per masked-min sweep — at 24.5k
points / k=6 (the EWA splat-setup query, rendering/rasterizer.py:152)
that is ~33 GB of HBM traffic and 46 ms on a v5e. This kernel is the
TPU-native redesign (SURVEY.md §7 M2): the full point set lives in
VMEM (295 KB for 24.5k points — up to ~1M points fit), distances are
computed chunk-by-chunk in VMEM and consumed immediately by a running
top-K merge, so nothing (N, P)-sized ever touches HBM.

On top of the streaming scan, a GRID-FREE spatial prune replaces the
reference's FRNN uniform grid (DSS/core/rasterizer.py:909-921): points
and queries are Morton-sorted host-side, so each 2048-point chunk is a
compact spatial cell; the kernel carries the running kth-best bound in
SMEM and SKIPS any chunk whose bounding-box distance to the query
tile's bounding box cannot beat it. Chunks are visited ring-outward
from the query tile's "home" chunk (same curve position) so the bound
tightens after one or two merges. This keeps the exactness of brute
force (a skipped chunk provably contains no winner) with grid-like
work: measured 19.5 -> 4.1 ms for the 24.5k/k=6 self-query.

Reference parity: replaces the external FRNN CUDA grid / pytorch3d
knn_points; squared distances like pytorch3d. Exact same neighbor
SET and ascending order as the dense path; index tie-breaking at
exactly-equal distances: coincident points keep first-occurrence
(lowest index) order within a chunk (the Morton sort is stable), but
equal-distance DISTINCT points in different chunks follow chunk visit
order — the dense path and this kernel may disagree there (as may any
two float orderings at rounding-level ties).

Limits: k <= 16 (selection is k masked-min sweeps), P <= ~1M (points
+ one distance chunk must fit VMEM). Masked/padded queries and points
supported; self-exclusion by global index. Falls back to interpret
mode off-TPU (tests).
"""

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def _sizes(k: int, p_pad: int):
    """(query rows per instance, db columns per chunk): the k-sweep
    merge keeps ~4 live (TQ, 128+CHUNK) f32/i32 arrays on the Mosaic
    stack, PLUS the whole 4×(1, P) point set — halve the tile for
    large k or large P to stay inside the 16 MB scoped VMEM limit
    (k=8 at TQ=512/P=196k measured 19.9 MB: OOM)."""
    tq = 512 if k <= 6 else 256
    if p_pad > 131072:
        tq = 256
    return tq, 2048


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _morton30(x: jax.Array, lo: jax.Array, hi: jax.Array) -> jax.Array:
    """(N, 3) f32 -> (N,) int32 Morton code (10 bits/axis interleaved).
    Only used as a SORT key for spatial locality — never for
    correctness (the kernel prunes on exact f32 bounding boxes)."""
    g = jnp.clip((x - lo) / jnp.maximum(hi - lo, 1e-12) * 1023.0,
                 0.0, 1023.0).astype(jnp.uint32)

    def spread(v):
        v = (v | (v << 16)) & 0x030000FF
        v = (v | (v << 8)) & 0x0300F00F
        v = (v | (v << 4)) & 0x030C30C3
        v = (v | (v << 2)) & 0x09249249
        return v

    code = spread(g[:, 0]) | (spread(g[:, 1]) << 1) | (spread(g[:, 2]) << 2)
    return code.astype(jnp.int32)  # < 2^30: sign-safe as int32


def _knn_kernel(k: int, n_chunks: int, exclude_self: bool, chunk: int,
                tq: int):
    """Grid = (n_query_tiles,). Refs: home (1, n_tiles) SMEM,
    bbox (6, n_chunks) SMEM (xmin,ymin,zmin,xmax,ymax,zmax per chunk),
    q (TQ, 3), px/py/pz/psq (1, P) VMEM; outputs best_d (TQ, k) f32,
    best_i (TQ, k) int32; scratch bd/bi (TQ, 128) VMEM, th (1,) SMEM."""

    pad_k = 128  # running-best carried 128-lane padded (TPU tile width)

    def kernel(home_ref, bbox_ref, q_ref, px_ref, py_ref, pz_ref, psq_ref,
               d_ref, i_ref, bd_ref, bi_ref, th_ref):
        ti = pl.program_id(0)
        q = q_ref[:]                                    # (TQ, 3)
        qsq = jnp.sum(q * q, axis=-1, keepdims=True)    # (TQ, 1)
        qx = q[:, 0:1]
        qy = q[:, 1:2]
        qz = q[:, 2:3]
        q_gidx = ti * tq + jax.lax.broadcasted_iota(jnp.int32, (tq, 1), 0)

        # query-tile bounding box (pad rows are zeros — they only widen
        # the box toward the origin, costing prunes on the last tile)
        qx0, qx1 = jnp.min(qx), jnp.max(qx)
        qy0, qy1 = jnp.min(qy), jnp.max(qy)
        qz0, qz1 = jnp.min(qz), jnp.max(qz)

        bd_ref[:] = jnp.full((tq, pad_k), _BIG, jnp.float32)
        bi_ref[:] = jnp.full((tq, pad_k), -1, jnp.int32)
        th_ref[0] = _BIG
        home = home_ref[0, ti]

        def body(j, th):
            # ring visit order: home, home+1, home-1, home+2, ... mod
            # n_chunks — each chunk exactly once, nearest (on the
            # Morton curve) first so the kth-best bound tightens early
            s = (j + 1) // 2
            off = jnp.where(j % 2 == 1, s, -s)
            cc = jax.lax.rem(home + off + n_chunks, n_chunks)

            # exact f32 box-to-box lower bound on squared distance
            ax = jnp.maximum(jnp.maximum(bbox_ref[0, cc] - qx1,
                                         qx0 - bbox_ref[3, cc]), 0.0)
            ay = jnp.maximum(jnp.maximum(bbox_ref[1, cc] - qy1,
                                         qy0 - bbox_ref[4, cc]), 0.0)
            az = jnp.maximum(jnp.maximum(bbox_ref[2, cc] - qz1,
                                         qz0 - bbox_ref[5, cc]), 0.0)
            lb = ax * ax + ay * ay + az * az

            @pl.when(lb < th)
            def _():
                lo = cc * chunk
                px = px_ref[:, pl.dslice(lo, chunk)]         # (1, C)
                py = py_ref[:, pl.dslice(lo, chunk)]
                pz = pz_ref[:, pl.dslice(lo, chunk)]
                psq = psq_ref[:, pl.dslice(lo, chunk)]
                # d = |q|² + |p|² − 2⟨q,p⟩, expanded per coordinate so
                # the contraction is 3 rank-1 FMAs on the VPU (a
                # (TQ,3)@(3,C) MXU dot wastes 125/128 of the array)
                d = qsq + psq - 2.0 * (qx * px + qy * py + qz * pz)
                d = jnp.maximum(d, 0.0)
                col = lo + jax.lax.broadcasted_iota(
                    jnp.int32, (tq, chunk), 1)
                if exclude_self:
                    d = jnp.where(col == q_gidx, _BIG, d)

                # second-level prune: a candidate can only enter row
                # r's top-k if d < kth_r ≤ th, so a chunk with no
                # d < th has no winners — skip the k-sweep merge (the
                # common case for Morton-discontinuity "fat boxes"
                # that overlap the tile without containing neighbors)
                @pl.when(jnp.any(d < th))
                def _():
                    # merge: k masked-min sweeps over [best | chunk]
                    # (the best block keeps its 128-lane padding; pad
                    # lanes hold _BIG so they never win a sweep)
                    cand_d = jnp.concatenate([bd_ref[:], d], axis=-1)
                    cand_i = jnp.concatenate([bi_ref[:], col], axis=-1)
                    new_d = []
                    new_i = []
                    for _ in range(k):
                        jmin = jnp.argmin(cand_d, axis=-1)   # (TQ,)
                        hit = (jax.lax.broadcasted_iota(
                            jnp.int32, cand_d.shape, 1) == jmin[:, None])
                        new_d.append(jnp.min(cand_d, axis=-1,
                                             keepdims=True))
                        new_i.append(jnp.sum(jnp.where(hit, cand_i, 0),
                                             axis=-1, keepdims=True))
                        cand_d = jnp.where(hit, _BIG, cand_d)
                    pad_d = jnp.full((tq, pad_k - k), _BIG, jnp.float32)
                    pad_i = jnp.full((tq, pad_k - k), -1, jnp.int32)
                    bd_ref[:] = jnp.concatenate(new_d + [pad_d], -1)
                    bi_ref[:] = jnp.concatenate(new_i + [pad_i], -1)
                    # tightened bound: max over queries of the kth best
                    th_ref[0] = jnp.max(new_d[k - 1])

            return th_ref[0]

        jax.lax.fori_loop(0, n_chunks, body, _BIG, unroll=False)
        d_ref[:] = bd_ref[:, :k]
        i_ref[:] = bi_ref[:, :k]

    return kernel


@functools.partial(jax.jit, static_argnames=("k", "exclude_self",
                                             "interpret"))
def _knn_flat(query: jax.Array, points: jax.Array, points_valid: jax.Array,
              k: int, exclude_self: bool, interpret: bool
              ) -> Tuple[jax.Array, jax.Array]:
    """(N, 3) x (P, 3) -> ((N, k) sq dists, (N, k) indices)."""
    n, _ = query.shape
    p, _ = points.shape
    p_pad = _round_up(max(p, 1), 2048)
    tq, chunk = _sizes(k, p_pad)
    n_pad = _round_up(max(n, 1), tq)
    n_chunks = p_pad // chunk
    qp = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(query)
    pp = jnp.zeros((p_pad, 3), jnp.float32).at[:p].set(points)
    valid = jnp.zeros(p_pad, bool).at[:p].set(points_valid)

    # ---- Morton sort (locality only; results are unsorted at the end)
    lo = jnp.min(pp[:p], axis=0)
    hi = jnp.max(pp[:p], axis=0)
    maxcode = jnp.int32(0x7FFFFFFF)
    pcode = jnp.where(valid, _morton30(pp, lo, hi), maxcode)
    perm = jnp.argsort(pcode, stable=True)               # sorted -> orig
    pps = jnp.take(pp, perm, axis=0)
    vs = jnp.take(valid, perm)
    pcode_s = jnp.take(pcode, perm)

    if exclude_self and n_pad == p_pad:
        # query IS points: reuse the point sort so sorted row r is
        # sorted point r (q_gidx == col) — and skip a second argsort
        qperm = perm
        qps = jnp.take(qp, qperm, axis=0)
        qcode_s = pcode_s
    else:
        qcode = jnp.where(jnp.arange(n_pad) < n,
                          _morton30(qp, lo, hi), maxcode)
        if exclude_self:
            # masked queries must sort exactly like their point twins
            qcode = jnp.where(jnp.arange(n_pad) < n, pcode[:n_pad],
                              maxcode)
        qperm = jnp.argsort(qcode, stable=True)
        qps = jnp.take(qp, qperm, axis=0)
        qcode_s = jnp.take(qcode, qperm)

    # invalid/padded points: push distance beyond any real one
    psq = jnp.sum(pps * pps, axis=-1)
    psq = jnp.where(vs, psq, _BIG)

    # per-chunk bounding boxes over VALID points (empty chunk -> an
    # inverted box whose lower bound always prunes)
    pc = pps.reshape(n_chunks, chunk, 3)
    vc = vs.reshape(n_chunks, chunk, 1)
    bmin = jnp.min(jnp.where(vc, pc, _BIG), axis=1)       # (nc, 3)
    bmax = jnp.max(jnp.where(vc, pc, -_BIG), axis=1)
    bbox = jnp.concatenate([bmin.T, bmax.T], axis=0)      # (6, nc)

    # per-tile home chunk: curve position of the tile's median query
    n_tiles = n_pad // tq
    med = qcode_s[tq // 2::tq]                            # (n_tiles,)
    starts = pcode_s[::chunk]                             # (n_chunks,)
    home = jnp.clip(jnp.searchsorted(starts, med, side="right") - 1,
                    0, n_chunks - 1).astype(jnp.int32)[None, :]

    kernel = _knn_kernel(k, n_chunks, exclude_self, chunk, tq)
    row = lambda a: a.reshape(1, -1)
    grid = (n_tiles,)
    smem = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.SMEM)
    full = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0),
                                      memory_space=pltpu.VMEM)
    d, idx = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[smem((1, n_tiles)), smem((6, n_chunks)),
                  pl.BlockSpec((tq, 3), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
                  full((1, p_pad)), full((1, p_pad)), full((1, p_pad)),
                  full((1, p_pad))],
        out_shape=(jax.ShapeDtypeStruct((n_pad, k), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, k), jnp.int32)),
        out_specs=(pl.BlockSpec((tq, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((tq, k), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((tq, 128), jnp.float32),
                        pltpu.VMEM((tq, 128), jnp.int32),
                        pltpu.SMEM((1,), jnp.float32)],
        interpret=interpret,
    )(home, bbox, qps, row(pps[:, 0]), row(pps[:, 1]), row(pps[:, 2]),
      row(psq))

    # unsort queries; map sorted point indices back to original ids
    # (inverse permutation by scatter — cheaper than a second argsort)
    inv_q = jnp.zeros(n_pad, jnp.int32).at[qperm].set(
        jnp.arange(n_pad, dtype=jnp.int32))
    d = jnp.take(d, inv_q, axis=0)[:n]
    idx = jnp.take(idx, inv_q, axis=0)[:n]
    idx = jnp.where(idx >= 0, jnp.take(perm, jnp.clip(idx, 0), axis=0), -1)
    return d, idx


def knn_points_pallas(query: jax.Array, points: jax.Array,
                      query_mask: Optional[jax.Array] = None,
                      points_mask: Optional[jax.Array] = None,
                      k: int = 8, exclude_self: bool = False,
                      interpret: Optional[bool] = None):
    """Drop-in exact replacement for neighbors.knn_points (same masked
    semantics, squared distances, ascending order, -1 padding).

    Use for large P (the dense path wins below ~4k points where its
    single matmul is one kernel); requires k <= 16.
    """
    from isopoints_tpu.ops.neighbors import KNNResult

    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    b, n, _ = query.shape
    p = points.shape[1]
    if points_mask is None:
        points_mask = jnp.ones((b, p), dtype=bool)
    if query_mask is None:
        query_mask = jnp.ones((b, n), dtype=bool)
    query = jnp.where(query_mask[..., None], query, 0.0)
    points = jnp.where(points_mask[..., None], points, 0.0)

    kk = min(k, p)
    run = jax.vmap(lambda q, pt, pv: _knn_flat(
        q, pt, pv, kk, exclude_self, interpret))
    dists, idx = run(query, points, points_mask)

    valid = (dists < _BIG * 0.5) & query_mask[..., None]
    if kk < k:
        padw = k - kk
        dists = jnp.pad(dists, ((0, 0), (0, 0), (0, padw)),
                        constant_values=_BIG)
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, padw)),
                      constant_values=-1)
        valid = jnp.pad(valid, ((0, 0), (0, 0), (0, padw)))
    idx = jnp.where(valid, idx, -1)
    dists = jnp.where(valid, dists, _BIG)
    return KNNResult(dists=dists, idx=idx, mask=valid)
