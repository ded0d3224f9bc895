"""Differentiable EWA surface-splatting rasterizer.

Parity: reference DSS/core/rasterizer.py (`SurfaceSplatting`,
`EllipticalRasterizer`) + CUDA kernels DSS/csrc/rasterize_points.cu /
rasterize_points_backward.cu. Implements:

  * per-point EWA splat setup — projection Jacobian `WJk`
    (rasterizer.py:441-494), isotropic/global/anisotropic `Vrk`
    (:257-400), screen variance `GV = Jᵀ Vrk J + σ_aa·I·px²`
    (:432-435), ellipse conic + axis-aligned radii (:496-549), EWA
    normalization scaler |detMk|/√(4π²·detGV) (:556-557);
  * forward rasterization — per-pixel K-closest-by-depth with a
    depth-merging cut (rasterize_points.cu:64-210), producing
    idx/zbuf/qvalue/occupancy maps;
  * the DSS occupancy backward — long-range xy gradient
    (pixel−point)/dist²·grad_occ inside a `radii_backward_scaler`×
    enlarged window with inside/outside gating
    (rasterize_points.cu:673-760, rasterize_points_backward.cu:30-212)
    — defined as a `jax.custom_vjp`;
  * zbuf backward — scatter-add of grad_zbuf via the idx map
    (rasterize_points.cu:823-884).

TPU re-design (SURVEY.md §7 M5): the CUDA coarse→fine binning (shared
memory bitmasks, atomics, counting sort) is replaced by a tiled
gather formulation: the image is cut into TxT pixel tiles; each tile
selects its `max_points_per_tile` front-most overlapping splats with
one `top_k` (the "coarse" stage), then every pixel in the tile scores
those candidates and takes its K closest by depth with a second
`top_k` (the "fine" stage). Everything is dense, branch-free and
deterministic — no atomics, no sorting networks; `lax.scan` over tile
rows bounds memory. The backward uses the same tiling with scaled
radii and a `segment-sum` scatter instead of atomicAdd — deterministic
where the reference is not.

Pixel convention: pixel centers, +X left / +Y up in NDC —
x_ndc(col) = (S-2·col-1)/S (rasterization_utils.cuh:8-11 combined with
the axis flip in rasterize_points.cu:158-161).
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isopoints_tpu.core.camera import PerspectiveCamera
from isopoints_tpu.ops.neighbors import knn_points
from isopoints_tpu.utils import eps_denom, eps_sqrt
from isopoints_tpu.utils.mathutils import local_coord_frames

_BIG = 1e10


@dataclass(frozen=True)
class RasterizationSettings:
    """Parity: PointsRasterizationSettings (rasterizer.py:39-101)."""
    image_size: int = 256
    points_per_pixel: int = 5
    cutoff_threshold: float = 1.0
    depth_merging_threshold: float = 0.05
    Vrk_invariant: bool = False      # global h_k (reference Vrk_invariant)
    Vrk_isotropic: bool = True
    radii_backward_scaler: float = 10.0
    # static pixel-patch side for the occupancy backward's per-point
    # gather window (must cover 2·search_r·S/2 + 4 pixels; see
    # _occ_backward_one)
    backward_patch_pixels: int = 64
    antialiasing_sigma: float = 1.0
    backface_culling: bool = True
    clip_pts_grad: float = -1.0
    # TPU tiling knobs (replace bin_size / max_points_per_bin)
    tile_size: int = 16
    max_points_per_tile: int = 256
    # strip-level candidate pre-filter: per tile ROW, the front-most
    # splats overlapping the strip are selected first (top_k over P),
    # then per-tile candidates come from that subset — turns the
    # per-tile top_k from O(nt·P) into O(P + nt·strip). Same front-most
    # capacity semantics as max_points_per_tile, one level up.
    max_points_per_strip: int = 2048
    knn_k: int = 7
    # run the fine stage as a Pallas kernel (rendering/pallas_splat.py):
    # K masked-min sweeps in VMEM instead of per-pixel top_k sorts
    use_pallas: bool = False
    # run the coarse stage (strip+tile candidate selection) as a Pallas
    # kernel too (rendering/pallas_select.py): exact threshold
    # selection via integer bisection + prefix/one-hot dots instead of
    # the XLA strip+tile top_k sorts (~11.3 ms/frame at 24.5k/512px).
    # None = follow use_pallas; only active on the use_pallas path.
    use_pallas_selection: "Optional[bool]" = None
    # occupancy backward as a VMEM-resident Pallas kernel
    # (rendering/pallas_occ_bwd.py; measured 30 -> 14 ms at 24.5k
    # splats/512px, exact). None = auto: on for the TPU backend when
    # image_size % 8 == 0; the XLA patch path otherwise.
    use_pallas_backward: "Optional[bool]" = None


class Fragments(NamedTuple):
    """Parity: PointFragments (rasterizer.py:31-37)."""
    idx: jax.Array        # (B, S, S, K) int32, -1 empty
    zbuf: jax.Array       # (B, S, S, K) view depth, -1 empty
    qvalue: jax.Array     # (B, S, S, K) ellipse quadratic value
    occupancy: jax.Array  # (B, S, S) 0/1
    # (B, P) points that produced fragments — computed at candidate
    # level inside the rasterizer (a (S²K,)→(P,) bool scatter on the
    # untiled idx map costs ~9 ms at 512px; the tile-level
    # compare+reduce and 262k scatter cost ~3 ms)
    visibility: jax.Array
    # (B,) int32 candidates dropped by the static strip/tile capacities
    # (max_points_per_strip / max_points_per_tile) — nonzero means back
    # splats were silently culled; bench.py asserts zero
    tile_overflow: jax.Array


class SplatParams(NamedTuple):
    pts_ndc: jax.Array   # (B, P, 3) [x_ndc, y_ndc, view depth]
    ellipse: jax.Array   # (B, P, 3) conic (a, b, c)
    radii: jax.Array     # (B, P, 2) axis-aligned NDC radii
    cutoff: jax.Array    # (B, P) per-point cutoff threshold
    scaler: jax.Array    # (B, P) EWA normalization
    mask: jax.Array      # (B, P) renderable after depth/backface filters


def _tangent_basis(normals: jax.Array) -> jax.Array:
    """Deterministic orthonormal (u0, u1) ⊥ n, stacked (..., 2, 3).

    The reference uses a random cross product (rasterizer.py:336-341);
    any basis spans the same tangent plane, so we pick a branchless
    deterministic one (stable under jit, reproducible).
    """
    n = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    ez = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), n.shape)
    ex = jnp.broadcast_to(jnp.asarray([1.0, 0.0, 0.0]), n.shape)
    a = jnp.where(jnp.abs(n[..., 2:3]) < 0.9, ez, ex)
    u0 = jnp.cross(n, a)
    u0 = u0 / jnp.maximum(jnp.linalg.norm(u0, axis=-1, keepdims=True), 1e-12)
    u1 = jnp.cross(n, u0)
    return jnp.stack([u0, u1], axis=-2)


def splat_spacing(points: jax.Array, mask: jax.Array,
                  settings: RasterizationSettings) -> jax.Array:
    """Per-point splat spacing h_k = ½·max kNN dist² (rasterizer.py:
    344-386, pre-clip), the only kNN-derived quantity the isotropic /
    global Vrk paths need.

    Exposed so callers can HOIST/CACHE it: the kNN costs ~11 ms at
    24.5k pts and the point set only changes at iso-refresh cadence
    (combined model) or between projection rounds — recomputing it
    inside every `compute_splat_params` call dominates the splat
    frame. Pass the result as `spacing=`.
    """
    s = settings
    res = knn_points(points, points, mask, mask, k=max(s.knn_k - 1, 1),
                     exclude_self=True)
    sq = jnp.where(res.mask, res.dists, 0.0)
    h_k = 0.5 * jnp.max(sq, axis=-1)                          # (B, P)
    # too-few-neighbor clouds: sq_dist=1e-3 -> h_k=5e-4 (reference :377-385)
    enough = jnp.sum(mask.astype(jnp.int32), axis=-1, keepdims=True) >= s.knn_k
    return jnp.where(enough, h_k, 5e-4)


def compute_splat_params(points: jax.Array, normals: jax.Array, mask: jax.Array,
                         camera: PerspectiveCamera,
                         settings: RasterizationSettings,
                         cutoff_scale=None,
                         spacing: Optional[jax.Array] = None) -> SplatParams:
    """Per-point EWA parameters (rasterizer.py:523-563 _get_per_point_info,
    plus the depth/backface filters :149-218).

    Only `pts_ndc` carries gradients (the reference detaches all
    per-point info and only the screen-space transform is
    differentiable, rasterizer.py:558-563,618).

    `spacing`: optional precomputed `splat_spacing` h_k (B, P) or
    (1, P) broadcastable — skips the per-call kNN for the isotropic /
    global Vrk paths (the anisotropic path needs the neighbors
    themselves and always recomputes).
    """
    s = settings
    b, p, _ = points.shape

    view = camera.world_to_view(points)                       # (B, P, 3)
    z = view[..., 2]
    depth_ok = (z >= camera.znear) & (z <= camera.zfar)
    rmask = mask & depth_ok
    if s.backface_culling:
        normals_view = jnp.einsum("bpi,bij->bpj", normals, camera.R)
        rmask = rmask & (normals_view[..., 2] < 0)

    pts_ndc = camera.project_ndc(points, with_view_depth=True)

    sg = jax.lax.stop_gradient
    points_d = sg(points)
    normals_d = sg(normals)

    # --- Vrk: h_k from knn spacing (rasterizer.py:344-400); the
    # reference queries K=7 INCLUDING self -> 6 true neighbors
    need_knn = spacing is None or not (s.Vrk_isotropic or s.Vrk_invariant)
    if need_knn:
        res = knn_points(points_d, points_d, mask, mask,
                         k=max(s.knn_k - 1, 1), exclude_self=True)
    if spacing is None:
        sq = jnp.where(res.mask, res.dists, 0.0)
        h_k = 0.5 * jnp.max(sq, axis=-1)                      # (B, P)
        enough = jnp.sum(mask.astype(jnp.int32), axis=-1,
                         keepdims=True) >= s.knn_k
        h_k = jnp.where(enough, h_k, 5e-4)
    else:
        h_k = jnp.broadcast_to(sg(spacing), (b, p))
    if s.Vrk_invariant:
        denom = jnp.maximum(jnp.sum(rmask, axis=-1, keepdims=True), 1)
        h_k = jnp.sum(jnp.where(rmask, h_k, 0.0), axis=-1, keepdims=True) / denom
        h_k = jnp.clip(h_k, 5e-5, 1e-3) * jnp.ones_like(z)
    else:
        h_k = jnp.clip(h_k, 5e-5, 0.01)

    Sk = _tangent_basis(normals_d)                            # (B, P, 2, 3)
    if s.Vrk_isotropic or s.Vrk_invariant:
        Vrk = h_k[..., None, None] * jnp.einsum("bpki,bpkj->bpij", Sk, Sk)
    else:
        # anisotropic: curvature-scaled tangent variance (rasterizer.py:257-292)
        from isopoints_tpu.ops.neighbors import knn_gather
        nn = knn_gather(points_d, res.idx)
        evals, frames = local_coord_frames(points_d, nn, res.mask)
        tang = frames[..., 1:]                                # (B,P,3,2) ascending evals
        curv = evals[..., 1:]
        Vrk = jnp.einsum("bpik,bpk,bpjk->bpij", tang, curv, tang)
        Sk = jnp.swapaxes(tang, -1, -2)

    # --- projection Jacobian Mk = d ndc_xy / d p_world (rasterizer.py:441-494)
    # view = p @ R + T  =>  dview/dp = R (row-vector convention);
    # ndc = [fx·x/z + px, fy·y/z + py]  =>  Jv (3, 2)
    view_d = sg(view)
    zd = eps_denom(view_d[..., 2], 1e-10)
    fl = camera.focal_length[:, None, :]                      # (B, 1, 2)
    j00 = fl[..., 0] / zd
    j11 = fl[..., 1] / zd
    j20 = -fl[..., 0] * view_d[..., 0] / (zd * zd)
    j21 = -fl[..., 1] * view_d[..., 1] / (zd * zd)
    zero = jnp.zeros_like(j00)
    Jv = jnp.stack([
        jnp.stack([j00, zero], -1),
        jnp.stack([zero, j11], -1),
        jnp.stack([j20, j21], -1),
    ], axis=-2)                                               # (B, P, 3, 2)
    Mk = jnp.einsum("bij,bpjk->bpik", camera.R, Jv)           # (B, P, 3, 2)

    # --- screen variance GV = Mkᵀ Vrk Mk + σ_aa·I·px² (rasterizer.py:432-435)
    Vk = jnp.einsum("bpij,bpik,bpkl->bpjl", Mk, Vrk, Mk)
    pixel_size = 2.0 / s.image_size
    GV = Vk + s.antialiasing_sigma * (pixel_size ** 2) * jnp.eye(2)

    detMk = jnp.linalg.det(jnp.einsum("bpki,bpij->bpkj", Sk[..., :2, :], Mk))
    detGV = GV[..., 0, 0] * GV[..., 1, 1] - GV[..., 0, 1] * GV[..., 1, 0]
    inv_det = 1.0 / eps_denom(detGV, 1e-12)
    inv00 = GV[..., 1, 1] * inv_det
    inv11 = GV[..., 0, 0] * inv_det
    inv01 = -GV[..., 0, 1] * inv_det
    inv10 = -GV[..., 1, 0] * inv_det
    ellipse = jnp.stack([inv00, inv01 + inv10, inv11], axis=-1)

    # --- axis-aligned radii (rasterizer.py:496-521)
    a, bb, c = ellipse[..., 0], ellipse[..., 1], ellipse[..., 2]
    cut = jnp.full_like(a, s.cutoff_threshold)
    if cutoff_scale is not None:
        # global learnable splat-size scaler (point_modeling.py:43's
        # point_size_scaler entering as a cutoff scale)
        cut = cut * sg(cutoff_scale)
    denom = eps_denom(4.0 * a * c - bb * bb, 1e-12)
    ry = jnp.sqrt(eps_sqrt(4.0 * a * cut / denom, 1e-17))
    rx = jnp.sqrt(eps_sqrt(4.0 * c * cut / denom, 1e-17))
    radii = jnp.stack([rx, ry], axis=-1)

    scaler = jnp.abs(detMk) / eps_denom(
        jnp.sqrt(eps_sqrt(detGV * 4.0 * math.pi * math.pi, 1e-17)), 1e-12)

    return SplatParams(pts_ndc=pts_ndc, ellipse=sg(ellipse), radii=sg(radii),
                       cutoff=sg(cut), scaler=sg(scaler), mask=rmask)


# ---------------------------------------------------------------------------
# Forward rasterization (rasterize_points.cu:64-210 semantics)
# ---------------------------------------------------------------------------

def _pixel_ndc(idx: jax.Array, size: int) -> jax.Array:
    """Pixel-center NDC coordinate with the reference's axis flip:
    ndc(col) = (S − 2·col − 1)/S (decreasing; +X left, +Y up)."""
    return (size - 2.0 * idx.astype(jnp.float32) - 1.0) / size


def _tile_candidates(px, py, z, rx, ry, valid, cy, cx, half, m,
                     strip_cap: int = 0):
    """Select the `m` front-most splats whose bbox touches the tile.

    Returns (cand_idx (nt, m), cand_ok (nt, m), overflow ()) for one
    row of tiles. cy is scalar (tile-row center), cx (nt,) per-tile
    centers. With `strip_cap` > 0 and P > strip_cap, a strip-level
    top_k first narrows to the front-most splats overlapping the whole
    tile row. `overflow` counts candidates DROPPED by the static
    strip/tile capacities — a nonzero count means back splats were
    silently culled (usually harmless occlusion, but it must be
    observable; bench.py asserts zero).

    Selection stays `top_k` (full sort): the O(P) cumsum+scatter
    compaction alternative was MEASURED SLOWER (candidates stage
    6.5 -> 20.6 ms at 24.5k splats/512px — TPU scatters cost ~9 ms per
    1.3M rows and the strip+tile compactions need 2.8M); shrink the
    caps against measured occupancy instead."""
    if strip_cap and px.shape[0] > strip_cap:
        strip = (jnp.abs(py - cy) <= (ry + half)) & valid     # (P,)
        strip_ovf = jnp.maximum(
            jnp.sum(strip.astype(jnp.int32)) - strip_cap, 0)
        sscore = jnp.where(strip, -z, -_BIG)
        neg_sz, sidx = jax.lax.top_k(sscore, strip_cap)       # (R,)
        s_ok = neg_sz > -_BIG * 0.5
        cand_l, ok_l, tile_ovf = _tile_candidates(
            px[sidx], py[sidx], z[sidx], rx[sidx], ry[sidx],
            s_ok, cy, cx, half, m)
        return sidx[cand_l], ok_l, strip_ovf + tile_ovf
    overlap_y = jnp.abs(py - cy) <= (ry + half)               # (P,)
    overlap = overlap_y[None, :] & \
        (jnp.abs(px[None, :] - cx[:, None]) <= (rx[None, :] + half))  # (nt, P)
    ok = overlap & valid[None, :]
    ovf = jnp.sum(jnp.maximum(
        jnp.sum(ok.astype(jnp.int32), axis=1) - m, 0))
    score = jnp.where(ok, -z[None, :], -_BIG)
    neg_z, cand_idx = jax.lax.top_k(score, m)                 # (nt, m)
    return cand_idx, neg_z > -_BIG * 0.5, ovf


def _rasterize_one(pts, ellipse, radii, cutoff, valid,
                   settings: RasterizationSettings):
    """Rasterize one cloud. pts (P, 3) in [x_ndc, y_ndc, depth]."""
    s = settings
    S, T, K = s.image_size, s.tile_size, s.points_per_pixel
    M = min(s.max_points_per_tile, pts.shape[0])
    assert S % T == 0, "image_size must be a multiple of tile_size"
    nt = S // T

    px, py, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rx, ry = radii[:, 0], radii[:, 1]
    valid = valid & (z >= 0)  # behind-camera skip (rasterize_points.cu:88-89)

    cols = jnp.arange(S)
    xs = _pixel_ndc(cols, S)                                  # (S,) decreasing
    half = float(T - 1) / S  # distance from tile center to farthest pixel center

    tile_centers_x = 0.5 * (xs[::T] + xs[T - 1::T])           # (nt,)

    if s.use_pallas:
        return _rasterize_one_pallas(pts, ellipse, radii, cutoff, valid,
                                     xs, half, tile_centers_x, s, M)

    def row_fn(ti):
        rows = ti * T + jnp.arange(T)
        ys = _pixel_ndc(rows, S)                              # (T,)
        cy = 0.5 * (ys[0] + ys[-1])
        cand_idx, cand_ok, ovf = _tile_candidates(
            px, py, z, rx, ry, valid, cy, tile_centers_x, half, M,
            strip_cap=s.max_points_per_strip)                  # (nt, M)

        g = lambda v: v[cand_idx]                              # (nt, M)
        cpx, cpy, cz = g(px), g(py), g(z)
        ca, cb, cc = g(ellipse[:, 0]), g(ellipse[:, 1]), g(ellipse[:, 2])
        crx, cry, ccut = g(rx), g(ry), g(cutoff)

        # pixel grid of this tile row: (T rows, nt*T cols)
        xf = xs.reshape(nt, T)                                 # (nt, T)
        # dx,dy: (nt, T, T, M) = (tile, row, col, cand)
        dx = xf[:, None, :, None] - cpx[:, None, None, :]
        dy = ys[None, :, None, None] - cpy[:, None, None, :]
        q = ca[:, None, None, :] * dx * dx + cb[:, None, None, :] * dx * dy \
            + cc[:, None, None, :] * dy * dy
        inside = (jnp.abs(dx) <= crx[:, None, None, :]) & \
                 (jnp.abs(dy) <= cry[:, None, None, :]) & \
                 (q <= ccut[:, None, None, :]) & cand_ok[:, None, None, :]

        zmask = jnp.where(inside, cz[:, None, None, :], _BIG)
        negz, kidx = jax.lax.top_k(-zmask, K)                  # (nt, T, T, K)
        zk = -negz
        kvalid = zk < _BIG * 0.5
        # depth merging cut (rasterize_points.cu:201-210)
        kvalid = kvalid & ((zk - zk[..., :1]) <= s.depth_merging_threshold)

        pick = lambda arr: jnp.take_along_axis(arr, kidx, axis=-1)
        qk = pick(q)
        idxk = jnp.take_along_axis(
            jnp.broadcast_to(cand_idx[:, None, None, :], zmask.shape), kidx, axis=-1)
        idxk = jnp.where(kvalid, idxk, -1)
        zk = jnp.where(kvalid, zk, -1.0)
        qk = jnp.where(kvalid, qk, -1.0)
        occ = jnp.any(inside, axis=-1).astype(jnp.float32)     # (nt, T, T)

        # (nt, T, T, K) -> (T rows, nt*T cols, K)
        tr = lambda v: v.transpose(1, 0, 2, 3).reshape(T, nt * T, K)
        return (tr(idxk), tr(zk), tr(qk),
                occ.transpose(1, 0, 2).reshape(T, nt * T), ovf)

    idx, zbuf, qv, occ, ovf = jax.lax.map(row_fn, jnp.arange(nt))
    idx = idx.reshape(S, S, K)
    safe = jnp.where(idx >= 0, idx, pts.shape[0])
    vis = jnp.zeros((pts.shape[0],), bool).at[safe.reshape(-1)].set(
        True, mode="drop")
    # no tiled residuals: the XLA path's backward uses the fused
    # (S²K,)->(P,) zbuf scatter (shape sentinel keeps vmap happy)
    return (idx, zbuf.reshape(S, S, K), qv.reshape(S, S, K),
            occ.reshape(S, S), vis, ovf.sum(), None)


def _rasterize_one_pallas(pts, ellipse, radii, cutoff, valid, xs, half,
                          tile_centers_x, s: RasterizationSettings, M: int):
    """Coarse stage in XLA (per-tile candidate top_k) + fine stage as a
    Pallas kernel (pallas_splat.rasterize_fine_pallas)."""
    from isopoints_tpu.rendering.pallas_splat import rasterize_fine_pallas

    S, T, K = s.image_size, s.tile_size, s.points_per_pixel
    nt = S // T
    px, py, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rx, ry = radii[:, 0], radii[:, 1]

    use_sel = s.use_pallas_selection
    if use_sel is None:
        use_sel = True
    if use_sel:
        # coarse stage in-kernel: exact threshold selection, identical
        # candidate SETS to the top_k path (pallas_select docstring)
        from isopoints_tpu.rendering.pallas_select import (
            select_candidates_pallas,
        )
        cand_idx, cand_ok, overflow = select_candidates_pallas(
            px, py, z, rx, ry, valid, S=S, T=T, nt=nt,
            R=s.max_points_per_strip, M=M,
            interpret=jax.default_backend() != "tpu")
    else:
        def row_candidates(ti):
            rows = ti * T + jnp.arange(T)
            ys = _pixel_ndc(rows, S)
            cy = 0.5 * (ys[0] + ys[-1])
            return _tile_candidates(px, py, z, rx, ry, valid, cy,
                                    tile_centers_x, half, M,
                                    strip_cap=s.max_points_per_strip)

        cand_idx, cand_ok, ovf = jax.lax.map(row_candidates,
                                             jnp.arange(nt))
        overflow = ovf.sum()
        cand_idx = cand_idx.reshape(nt * nt, M)
        cand_ok = cand_ok.reshape(nt * nt, M)

    # gather all 9 per-point attributes in ONE row gather: XLA does not
    # merge same-index gathers, and each separate (nt², M) gather costs
    # ~1.9 ms at 24.5k splats/512px — stacked rows cost ~2.5 ms total
    table = jnp.stack([px, py, z, ellipse[:, 0], ellipse[:, 1],
                       ellipse[:, 2], rx, ry, cutoff], axis=-1)  # (P, 9)
    att = table[cand_idx]                                # (nt², M, 9)
    g = lambda j: att[..., j]
    idx, zbuf, qv, occ, used, slots = rasterize_fine_pallas(
        g(0), g(1), g(2), g(3), g(4),
        g(5), g(6), g(7), g(8), cand_ok, cand_idx,
        T=T, K=K, S=S, nt=nt,
        depth_merging_threshold=s.depth_merging_threshold,
        interpret=jax.default_backend() != "tpu")

    # visibility at candidate level: the kernel emits per-candidate
    # `used` flags (selected in any pixel's K picks) for free — only
    # the 262k-element scatter back to point ids remains (re-deriving
    # used from the idx map costs an (n_tiles·T²K·M) compare, ~3 ms)
    p_cap = pts.shape[0]
    flat_id = jnp.where(used.reshape(-1), cand_idx.reshape(-1), p_cap)
    vis = jnp.zeros((p_cap,), bool).at[flat_id].set(True, mode="drop")

    def untile(a, ch):
        return a.reshape(nt, nt, T, T, ch).transpose(0, 2, 1, 3, 4) \
            .reshape(S, S, ch)
    return (untile(idx, K), untile(zbuf, K), untile(qv, K),
            untile(occ[..., None], 1)[..., 0], vis, overflow,
            (slots, cand_idx))


def _occ_backward_one(pts, radii, visible, grad_occ,
                      settings: RasterizationSettings):
    """DSS occupancy→xy gradient for one cloud.

    Parity: the reference's DEFAULT backward path, the fast grid kernel
    (rasterize_points_backward.cu:99-178 + host search-radius setup,
    rasterizer.py:884-904): for every pixel with grad_occ≠0 and every
    visible point within the per-cloud radial window
    dist² ≤ (median(radii)·radii_backward_scaler)², accumulate
    (pixel−point)/dist²·grad_occ, skipping positive-grad pixels outside
    the point's UNSCALED splat bbox. (The slow CUDA and CPU variants
    use per-point scaled-bbox windows — with differing inner tests —
    but they are not the production path.)

    TPU formulation: per-POINT gather over a static (W, W) pixel patch
    of the grad_occ image centered on the point (the pixel grid is
    regular, so "all pixels within search_r of the point" is a fixed
    window) — no per-tile candidate cap (the previous tile formulation
    dropped gradients when >max_points_per_tile points fell in a tile's
    search window), no top_k, no scatter: the per-point sums come out
    point-major. W = `backward_patch_pixels`; the search radius is
    clamped to (W/2 − 2) pixels so the patch always covers the window
    (at the default W=64 the clamp only binds for degenerate
    median-radius × 10 windows wider than 60 px).
    """
    s = settings
    S = s.image_size
    W = min(s.backward_patch_pixels, S)
    rs = s.radii_backward_scaler

    px, py, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rx, ry = radii[:, 0], radii[:, 1]
    renderable = visible & (z >= 0) & (jnp.abs(px) <= 1.0) & (jnp.abs(py) <= 1.0)

    # per-cloud search radius: median of the visible radii (both axes)
    # times the backward scaler (rasterizer.py:884)
    r_flat = jnp.where(renderable[:, None], radii, jnp.nan).reshape(-1)
    search_r = jnp.nan_to_num(jnp.nanmedian(r_flat), nan=1e-3) * rs
    if W < S:
        # static-capacity cap: the patch must cover the window (when
        # the patch IS the image, any radius is covered exactly)
        search_r = jnp.minimum(search_r, (W / 2.0 - 2.0) * 2.0 / S)
    search_r2 = search_r * search_r

    # point pixel indices: ndc = (S − 2i − 1)/S  ⇒  i = (S(1 − ndc) − 1)/2
    # (nan_to_num: masked/invalid points may carry non-finite coords;
    # their patches are gated off by `renderable` but the slice offsets
    # must still be well-defined integers)
    col_f = jnp.nan_to_num((S * (1.0 - px) - 1.0) * 0.5)
    row_f = jnp.nan_to_num((S * (1.0 - py) - 1.0) * 0.5)
    c0 = jnp.clip(jnp.round(col_f).astype(jnp.int32) - W // 2, 0, S - W)
    r0 = jnp.clip(jnp.round(row_f).astype(jnp.int32) - W // 2, 0, S - W)

    n_pts = pts.shape[0]
    chunk = max(min(2048, n_pts), 1)
    pad = (-n_pts) % chunk
    pad_fn = lambda a, v: jnp.concatenate(
        [a, jnp.full((pad,) + a.shape[1:], v, a.dtype)], 0) if pad else a
    cpx = pad_fn(px, 0.0).reshape(-1, chunk)
    cpy = pad_fn(py, 0.0).reshape(-1, chunk)
    crx = pad_fn(rx, 0.0).reshape(-1, chunk)
    cry = pad_fn(ry, 0.0).reshape(-1, chunk)
    cc0 = pad_fn(c0, 0).reshape(-1, chunk)
    cr0 = pad_fn(r0, 0).reshape(-1, chunk)
    cren = pad_fn(renderable, False).reshape(-1, chunk)
    w_idx = jnp.arange(W)

    def chunk_fn(args):
        qx, qy, qrx, qry, qc0, qr0, qok = args
        patch = jax.vmap(
            lambda r, c: jax.lax.dynamic_slice(grad_occ, (r, c), (W, W))
        )(qr0, qc0)                                            # (n, W, W)
        # patch pixel centers in NDC: rows vary dy, cols vary dx
        xs_p = _pixel_ndc(qc0[:, None] + w_idx[None, :], S)    # (n, W)
        ys_p = _pixel_ndc(qr0[:, None] + w_idx[None, :], S)    # (n, W)
        dx = xs_p[:, None, :] - qx[:, None, None]              # (n, 1->W, W)
        dy = ys_p[:, :, None] - qy[:, None, None]              # (n, W, 1->W)
        dist2 = dx * dx + dy * dy
        outside_splat = (jnp.abs(dx) > qrx[:, None, None]) | \
                        (jnp.abs(dy) > qry[:, None, None])
        use = (dist2 <= search_r2) & (patch != 0.0) & qok[:, None, None] & \
            ~((patch > 0.0) & outside_splat)
        denom = eps_denom(dist2, 1e-10)
        gx = jnp.where(use, dx / denom * patch, 0.0).sum(axis=(1, 2))
        gy = jnp.where(use, dy / denom * patch, 0.0).sum(axis=(1, 2))
        return gx, gy

    gx, gy = jax.lax.map(chunk_fn, (cpx, cpy, crx, cry, cc0, cr0, cren))
    grad = jnp.stack([gx.reshape(-1)[:n_pts], gy.reshape(-1)[:n_pts]], -1)
    return grad.astype(pts.dtype)


def _rasterize_fwd_impl(pts_ndc, ellipse, radii, cutoff, mask, settings):
    f = jax.vmap(partial(_rasterize_one, settings=settings))
    idx, zbuf, qv, occ, vis, ovf, extras = f(pts_ndc, ellipse, radii,
                                             cutoff, mask)
    frags = Fragments(idx=idx, zbuf=zbuf, qvalue=qv, occupancy=occ,
                      visibility=vis, tile_overflow=ovf)
    return frags, extras


@partial(jax.custom_vjp, nondiff_argnums=(5,))
def rasterize_splats(pts_ndc, ellipse, radii, cutoff, mask,
                     settings: RasterizationSettings) -> Fragments:
    """Differentiable splat rasterization (EllipticalRasterizer.apply).

    Gradients flow ONLY to `pts_ndc`: xy from the occupancy map (DSS
    long-range gradient), z from zbuf scatter. qvalue/idx cotangents
    are discarded (parity: rasterizer.py:784-785 — color gradients flow
    through the compositor weights instead).
    """
    return _rasterize_fwd_impl(pts_ndc, ellipse, radii, cutoff, mask,
                               settings)[0]


def _rasterize_fwd(pts_ndc, ellipse, radii, cutoff, mask, settings):
    frags, extras = _rasterize_fwd_impl(pts_ndc, ellipse, radii, cutoff,
                                        mask, settings)
    # the tiled backward reduces from the (B, n_tiles, M) candidate
    # slots; idx is only needed by the untiled fallback — dropping it
    # halves fragment-map residual memory at 512px/K=5 (advisor r3)
    res = (pts_ndc, radii, mask, None if extras is not None else frags.idx,
           frags.visibility, extras)
    return frags, res


def _rasterize_bwd(settings, res, g: Fragments):
    import numpy as np

    pts_ndc, radii, mask, idx, fwd_vis, extras = res
    b, p, _ = pts_ndc.shape

    if extras is not None:
        # tiled path: the fine kernel saved LOCAL candidate slots —
        # reduce the zbuf cotangent at TILE level ((n_tiles, M) rows)
        # and scatter once per candidate instead of once per fragment
        # (the untiled (S²K,)->(P,) scatter costs ~9-11 ms at 512px);
        # per-point visibility comes from the forward's used flags
        from isopoints_tpu.rendering.pallas_splat import (
            zbuf_backward_tile_pallas,
        )
        slots, cand_idx = extras
        S = settings.image_size
        T = settings.tile_size
        K = settings.points_per_pixel
        nt = S // T

        def tile_gz(one_gz):                       # (S, S, K) -> tiles
            return one_gz.reshape(nt, T, nt, T, K).transpose(
                0, 2, 1, 3, 4).reshape(nt * nt, T * T, K)

        M = cand_idx.shape[-1]
        gz_cand = jax.vmap(lambda sl, gz_img: zbuf_backward_tile_pallas(
            sl, tile_gz(gz_img), M=M,
            interpret=jax.default_backend() != "tpu"))(
                slots, g.zbuf)                      # (B, n_tiles, M)

        def scatter_cand(gc, ci):
            flat = ci.reshape(-1)
            return jnp.zeros((p,), pts_ndc.dtype).at[flat].add(
                gc.reshape(-1), mode="drop")

        gz = jax.vmap(scatter_cand)(gz_cand, cand_idx)
        visible = fwd_vis
    else:
        # ONE fused scatter builds both the zbuf gradient
        # (ZbufBackwardKernel, rasterize_points.cu:823-846) and the
        # per-point visibility count (rasterizer.py:850-863): two
        # separate (S²K,)→(P,) scatters cost ~11 ms EACH at 512px/K=5 —
        # fused 2-wide rows cost one pass
        def zb_vis(one_idx, one_gz):
            flat_i = one_idx.reshape(-1)
            ok = flat_i >= 0
            vals = jnp.stack([jnp.where(ok, one_gz.reshape(-1), 0.0),
                              ok.astype(pts_ndc.dtype)], axis=-1)  # (S²K, 2)
            acc = jnp.zeros((p, 2), pts_ndc.dtype).at[
                jnp.where(ok, flat_i, p)].add(vals, mode="drop")
            return acc[:, 0], acc[:, 1] > 0

        gz, visible = jax.vmap(zb_vis)(idx, g.zbuf)

    use_pallas_bwd = settings.use_pallas_backward
    if use_pallas_bwd is None:
        use_pallas_bwd = (jax.default_backend() == "tpu"
                          and settings.image_size % 8 == 0)
    if use_pallas_bwd:
        from isopoints_tpu.rendering.pallas_occ_bwd import (
            occ_backward_pallas_one,
        )
        gxy = jnp.stack([
            occ_backward_pallas_one(pts_ndc[i], radii[i],
                                    (visible & mask)[i], g.occupancy[i],
                                    settings)
            for i in range(b)])
    else:
        gxy = jax.vmap(partial(_occ_backward_one, settings=settings))(
            pts_ndc, radii, visible & mask, g.occupancy)

    grad_pts = jnp.concatenate([gxy, gz[..., None]], axis=-1)
    if settings.clip_pts_grad > 0:
        n = jnp.linalg.norm(grad_pts, axis=-1, keepdims=True)
        grad_pts = grad_pts / jnp.maximum(n, 1e-12) * \
            jnp.minimum(n, settings.clip_pts_grad)
    ellipse_shape = pts_ndc.shape[:-1] + (3,)
    return (grad_pts,
            jnp.zeros(ellipse_shape, pts_ndc.dtype),   # ellipse
            jnp.zeros_like(radii),                     # radii
            jnp.zeros((b, p), pts_ndc.dtype),          # cutoff
            np.zeros(mask.shape, jax.dtypes.float0))   # mask (bool)


rasterize_splats.defvjp(_rasterize_fwd, _rasterize_bwd)


def visible_point_mask(idx: jax.Array, num_points: int) -> jax.Array:
    """(B, P) mask of points appearing in the idx maps
    (get_per_point_visibility_mask, utils/__init__.py:378-399)."""
    def one(im):
        safe = jnp.where(im >= 0, im, num_points)
        return jnp.zeros((num_points,), bool).at[safe.reshape(-1)].set(
            True, mode="drop")
    return jax.vmap(one)(idx)
