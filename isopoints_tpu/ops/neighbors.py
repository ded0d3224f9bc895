"""Neighbor search: batched masked kNN / fixed-radius queries.

TPU-native replacement for the reference's FRNN CUDA extension
(SURVEY.md §2.1: `frnn.frnn_grid_points`, `frnn.frnn_gather`,
`DSS/utils/point_processing.py`, `DSS/models/levelset_sampling.py:132-139`).

Design: the distance matrix is a matmul — ||x−y||² = |x|²+|y|²−2⟨x,y⟩ —
so brute-force kNN rides the MXU and, blocked over queries, is faster
than grid-hash bucketing for the point counts this framework uses
(≤ ~10⁵ iso-points; the reference caps at 24k, trainer.py:91). Queries
are processed in blocks of `block_size` via `lax.map` to bound the
(N_block × P) distance tile in VMEM-friendly sizes. Radius queries are
kNN + distance mask, matching frnn's `K`-capped semantics.

All functions are batched (leading B), masked, and jit/vmap/pjit-safe
(static output shapes).
"""

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

_BIG = 1e10


class KNNResult(NamedTuple):
    dists: jax.Array  # (B, N, K) squared distances, ascending; _BIG if invalid
    idx: jax.Array    # (B, N, K) indices into points; -1 if invalid
    mask: jax.Array   # (B, N, K) validity


def _pad_to_multiple(x: jax.Array, axis: int, m: int):
    n = x.shape[axis]
    pad = (-n) % m
    if pad == 0:
        return x, n
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths), n


@partial(jax.jit, static_argnames=("k", "block_size", "exclude_self",
                                   "method"))
def knn_points(
    query: jax.Array,
    points: jax.Array,
    query_mask: Optional[jax.Array] = None,
    points_mask: Optional[jax.Array] = None,
    k: int = 8,
    block_size: int = 1024,
    exclude_self: bool = False,
    method: str = "auto",
) -> KNNResult:
    """Masked k-nearest-neighbors, blocked matmul formulation.

    Args:
      query:  (B, N, 3) query positions.
      points: (B, P, 3) database positions.
      query_mask / points_mask: (B, N) / (B, P) bool validity.
      k: neighbors to return (sorted by ascending squared distance).
      block_size: query rows per distance tile.
      exclude_self: drop zero-distance self matches by index identity
        (valid only when query IS points; compares indices, not
        distances, so coincident distinct points are kept).
      method: 'dense' (blocked matmul + masked-min sweeps), 'pallas'
        (VMEM-streaming exact kernel, ops/pallas_knn.py), or 'auto':
        pallas on the TPU backend when P ≥ 8192 and k ≤ 16 (measured
        45.6 -> 19.5 ms at P=24.5k/k=6 — the dense path re-reads (N, P)
        HBM tiles per sweep). Both are exact; index TIE-BREAKS can
        differ at rounding-identical distances (~1e-7).

    Returns KNNResult with squared distances (parity: pytorch3d
    knn_points returns squared dists, used throughout the reference).
    """
    b, n, _ = query.shape
    p = points.shape[1]

    if method == "auto":
        # upper bound: the pallas kernel holds 4 (1, P) f32 rows + the
        # merge buffers in VMEM (~16·P bytes) — cap well inside the
        # 16 MB scoped limit and fall back to the dense path above it
        method = ("pallas" if jax.default_backend() == "tpu"
                  and 8192 <= p <= 400_000 and k <= 16 else "dense")
    if method == "pallas":
        from isopoints_tpu.ops.pallas_knn import knn_points_pallas
        return knn_points_pallas(query, points, query_mask, points_mask,
                                 k=k, exclude_self=exclude_self)
    if points_mask is None:
        points_mask = jnp.ones((b, p), dtype=bool)
    if query_mask is None:
        query_mask = jnp.ones((b, n), dtype=bool)
    # sanitize: garbage (NaN/Inf) in masked-out rows must not poison the
    # distance matrix / top_k (NaN + BIG = NaN defeats masking)
    points = jnp.where(points_mask[..., None], points, 0.0)
    query = jnp.where(query_mask[..., None], query, 0.0)

    kk = min(k, p)
    pts_sq = jnp.sum(points * points, axis=-1)  # (B, P)
    invalid_pts = jnp.where(points_mask, 0.0, _BIG)  # (B, P)

    query_p, n_orig = _pad_to_multiple(query, 1, block_size)
    qmask_p, _ = _pad_to_multiple(query_mask, 1, block_size)
    nblocks = query_p.shape[1] // block_size
    qblocks = query_p.reshape(b, nblocks, block_size, 3).transpose(1, 0, 2, 3)
    qidx = jnp.arange(query_p.shape[1]).reshape(nblocks, block_size)

    def one_block(args):
        qb, qi = args  # (B, bs, 3), (bs,)
        d = (
            jnp.sum(qb * qb, axis=-1)[..., None]
            + pts_sq[:, None, :]
            - 2.0 * jnp.einsum("bnd,bpd->bnp", qb, points,
                               precision=jax.lax.Precision.HIGHEST)
        )
        d = jnp.maximum(d, 0.0) + invalid_pts[:, None, :]
        if exclude_self:
            self_hit = qi[None, :, None] == jnp.arange(p)[None, None, :]
            d = jnp.where(self_hit, _BIG, d)
        if kk <= 16:
            # kk masked-min sweeps: EXACT, same ascending order and
            # first-occurrence tie-breaking as top_k, but ~8x faster on
            # TPU for small k (lax.top_k sorts the whole row: measured
            # 716 ms vs 89 ms for the 24k-point EWA-setup kNN)
            vals, idxs = [], []
            for _ in range(kk):
                i = jnp.argmin(d, axis=-1)                 # (B, bs)
                v = jnp.take_along_axis(d, i[..., None], axis=-1)[..., 0]
                vals.append(v)
                idxs.append(i)
                d = d + jax.nn.one_hot(i, d.shape[-1], dtype=d.dtype) * _BIG
            return jnp.stack(vals, -1), jnp.stack(idxs, -1)
        neg_top, top_idx = jax.lax.top_k(-d, kk)  # (B, bs, kk)
        return -neg_top, top_idx

    dists, idx = jax.lax.map(one_block, (qblocks, qidx))
    dists = dists.transpose(1, 0, 2, 3).reshape(b, -1, kk)[:, :n_orig]
    idx = idx.transpose(1, 0, 2, 3).reshape(b, -1, kk)[:, :n_orig]

    valid = (dists < _BIG * 0.5) & query_mask[..., None]
    if kk < k:
        padw = k - kk
        dists = jnp.pad(dists, ((0, 0), (0, 0), (0, padw)), constant_values=_BIG)
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, padw)), constant_values=-1)
        valid = jnp.pad(valid, ((0, 0), (0, 0), (0, padw)))
    idx = jnp.where(valid, idx, -1)
    dists = jnp.where(valid, dists, _BIG)
    return KNNResult(dists=dists, idx=idx, mask=valid)


def radius_search(
    query: jax.Array,
    points: jax.Array,
    radius: float,
    query_mask: Optional[jax.Array] = None,
    points_mask: Optional[jax.Array] = None,
    k: int = 8,
    block_size: int = 1024,
    exclude_self: bool = False,
    method: str = "auto",
    max_per_cell: int = 64,
) -> KNNResult:
    """Fixed-radius neighbors, K-capped (frnn.frnn_grid_points parity:
    K nearest within `radius`; misses marked idx=-1 / dist=_BIG).

    `method`: 'dense' = brute-force matmul kNN + distance cut;
    'grid' = grid-hash buckets (the FRNN design, SURVEY §2.1/§7 M2 —
    O(P log P) build + O(27·C) per query instead of O(P));
    'auto' picks 'grid' above 32k database points (where the dense
    (N×P) tile stops being MXU-cheap).
    """
    p = points.shape[1]
    if method == "auto":
        method = "grid" if p > 32768 else "dense"
    if method == "grid":
        return grid_radius_search(query, points, radius, query_mask,
                                  points_mask, k=k,
                                  max_per_cell=max_per_cell,
                                  block_size=block_size,
                                  exclude_self=exclude_self)
    res = knn_points(query, points, query_mask, points_mask, k=k,
                     block_size=block_size, exclude_self=exclude_self)
    within = res.dists <= radius * radius
    valid = res.mask & within
    return KNNResult(
        dists=jnp.where(valid, res.dists, _BIG),
        idx=jnp.where(valid, res.idx, -1),
        mask=valid,
    )


# ---------------------------------------------------------------------------
# Grid-hash fixed-radius search (FRNN replacement for large clouds)
# ---------------------------------------------------------------------------

# 10 bits per axis: up to 1024 cells/axis. With cell edge = radius this
# covers bbox_extent/radius <= 1024 — far beyond any workload here
# (DTU scans normalized to ~1.5 cube, radii >= 1e-3).
_GRID_BITS = 10
_GRID_MAX = (1 << _GRID_BITS) - 1
_CELL_SENTINEL = jnp.int32(1 << 30)


@partial(jax.jit, static_argnames=("k", "max_per_cell", "block_size",
                                   "exclude_self"))
def grid_radius_search(
    query: jax.Array,
    points: jax.Array,
    radius: float,
    query_mask: Optional[jax.Array] = None,
    points_mask: Optional[jax.Array] = None,
    k: int = 8,
    max_per_cell: int = 64,
    block_size: int = 2048,
    exclude_self: bool = False,
) -> KNNResult:
    """Grid-bucketed fixed-radius K-nearest search.

    TPU-native FRNN (reference: external grid-hash CUDA, consumed at
    DSS/core/rasterizer.py:909-921 and levelset_sampling.py:132-139;
    counting-sort build + 27-cell window query). Here the build is a
    single `argsort` by cell id (XLA sort ≙ counting sort at these
    sizes) and the query gathers `max_per_cell` candidate slots from
    each of the 27 neighboring cells via two `searchsorted` probes —
    static shapes, no scatter, batched over query blocks.

    Exactness: identical to the dense path whenever no cell holds more
    than `max_per_cell` points (cells have edge `radius`, so C=64
    covers densities up to 64 points per radius³ — generous for kNN
    radii chosen from average spacing). Overflowing candidates beyond
    C per cell are dropped (the reference FRNN caps K per query the
    same way).
    """
    b, n, _ = query.shape
    p = points.shape[1]
    if points_mask is None:
        points_mask = jnp.ones((b, p), dtype=bool)
    if query_mask is None:
        query_mask = jnp.ones((b, n), dtype=bool)
    points = jnp.where(points_mask[..., None], points, 0.0)
    query = jnp.where(query_mask[..., None], query, 0.0)
    r2 = radius * radius
    cap = min(max_per_cell, p)

    offs = jnp.stack(jnp.meshgrid(*([jnp.arange(-1, 2)] * 3),
                                  indexing="ij"), axis=-1).reshape(27, 3)

    def one_batch(q, pts, pmask, qmask):
        any_valid = jnp.any(pmask)
        origin = jnp.where(
            any_valid,
            jnp.min(jnp.where(pmask[:, None], pts, _BIG), axis=0), 0.0)

        def cell_coords(x):
            return jnp.floor((x - origin) / radius).astype(jnp.int32)

        def cell_id(ci):
            ci = jnp.clip(ci, 0, _GRID_MAX)
            return ((ci[..., 0] << (2 * _GRID_BITS))
                    + (ci[..., 1] << _GRID_BITS) + ci[..., 2])

        cid = jnp.where(pmask, cell_id(cell_coords(pts)), _CELL_SENTINEL)
        order = jnp.argsort(cid)                     # build: sort by cell
        sorted_id = cid[order]

        ci_q = cell_coords(q)                        # (N, 3)
        nci = ci_q[:, None, :] + offs[None]          # (N, 27, 3)
        ncell_ok = jnp.all((nci >= 0) & (nci <= _GRID_MAX), axis=-1)
        nid = cell_id(nci)                           # (N, 27)

        qidx_all = jnp.arange(n)

        def one_block(args):
            qb, nid_b, nok_b, qi_b = args            # block of queries
            start = jnp.searchsorted(sorted_id, nid_b.ravel(),
                                     side="left").reshape(nid_b.shape)
            end = jnp.searchsorted(sorted_id, nid_b.ravel(),
                                   side="right").reshape(nid_b.shape)
            slot = start[..., None] + jnp.arange(cap)        # (bs, 27, C)
            ok = (slot < end[..., None]) & nok_b[..., None]
            slot = jnp.minimum(slot, p - 1)
            cand = order[slot]                               # (bs, 27, C)
            cpts = pts[cand]                                 # (bs, 27, C, 3)
            d2 = jnp.sum((qb[:, None, None, :] - cpts) ** 2, axis=-1)
            ok = ok & (d2 <= r2)
            if exclude_self:
                ok = ok & (cand != qi_b[:, None, None])
            d2 = jnp.where(ok, d2, _BIG)
            kk = min(k, 27 * cap)
            neg, sel = jax.lax.top_k(-d2.reshape(d2.shape[0], -1), kk)
            idx = jnp.take_along_axis(cand.reshape(cand.shape[0], -1),
                                      sel, axis=-1)
            return -neg, idx

        q_p, n_orig = _pad_to_multiple(q, 0, block_size)
        nid_p, _ = _pad_to_multiple(nid, 0, block_size)
        nok_p, _ = _pad_to_multiple(ncell_ok, 0, block_size)
        qi_p, _ = _pad_to_multiple(qidx_all, 0, block_size)
        nb = q_p.shape[0] // block_size
        shp = lambda x: x.reshape((nb, block_size) + x.shape[1:])
        dists, idx = jax.lax.map(
            one_block, (shp(q_p), shp(nid_p), shp(nok_p), shp(qi_p)))
        kk = dists.shape[-1]
        dists = dists.reshape(-1, kk)[:n_orig]
        idx = idx.reshape(-1, kk)[:n_orig]
        valid = (dists < _BIG * 0.5) & qmask[:, None]
        return dists, idx, valid

    dists, idx, valid = jax.vmap(one_batch)(query, points, points_mask,
                                            query_mask)
    kk = dists.shape[-1]
    if kk < k:
        padw = k - kk
        dists = jnp.pad(dists, ((0, 0), (0, 0), (0, padw)),
                        constant_values=_BIG)
        idx = jnp.pad(idx, ((0, 0), (0, 0), (0, padw)), constant_values=-1)
        valid = jnp.pad(valid, ((0, 0), (0, 0), (0, padw)))
    idx = jnp.where(valid, idx, -1)
    dists = jnp.where(valid, dists, _BIG)
    return KNNResult(dists=dists, idx=idx, mask=valid)


def knn_gather(x: jax.Array, idx: jax.Array, fill: float = 0.0) -> jax.Array:
    """Gather features by neighbor index (frnn.frnn_gather parity).

    Args:
      x: (B, P, C); idx: (B, N, K) with -1 for invalid.
    Returns: (B, N, K, C), `fill` where idx < 0.
    """
    b, n, k = idx.shape
    safe = jnp.maximum(idx, 0).reshape(b, n * k)
    out = jnp.take_along_axis(x, safe[..., None], axis=1).reshape(b, n, k, x.shape[-1])
    return jnp.where((idx < 0)[..., None], fill, out)
