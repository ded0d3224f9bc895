"""Level-set sampling: Newton projection, repulsion resampling,
saliency insertion, edge-aware upsampling, implicit-diff sample nets.

Parity: reference DSS/models/levelset_sampling.py — `UniformProjection`
(:79-440), `EdgeAwareProjection` (:442-662), `SampleNetwork` (:1170),
`DirectionalSamplingNetwork` (:1370), `sample_uniform_iso_points`
(:1405). TPU re-design (SURVEY.md §7):

  * Newton projection is ONE `lax.while_loop` over full-width padded
    arrays with masks — the reference shrinks a packed active set every
    iteration (boolean indexing), which is dynamic-shape hostile; at
    proj_max_iters ≤ 50 and MLP evals being matmul-bound, masked
    full-width iterations are faster on the MXU than compaction.
  * No chunking (`max_points_per_pass`): capacity is static; scale-out
    is by sharding points over devices, not host-side chunk loops.
  * The implicit-differentiation trick needs no autograd hooks: it is
    literally `p0 - (f(p0;θ) - sg f(p0;θ)) · sg ∇f / sg|∇f|²` with
    `stop_gradient` — value p, parameter-gradient -∇f/|∇f|²·∂f/∂θ
    (paper Eq. 13; reference levelset_sampling.py:1196-1204).
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isopoints_tpu.models.fields import sdf_and_grad
from isopoints_tpu.ops.neighbors import knn_points, knn_gather
from isopoints_tpu.ops.points import _bbox_diag, midpoint_upsample, wlop
from isopoints_tpu.utils import eps_denom, eps_sqrt, num_valid

SDFFn = Callable[[jax.Array], jax.Array]  # (..., 3) -> (...)


class ProjectionResult(NamedTuple):
    points: jax.Array    # (B, P, 3)
    normals: jax.Array   # (B, P, 3) — raw SDF gradients (not normalized)
    mask: jax.Array      # (B, P) converged & valid


@dataclass(frozen=True)
class ProjectionConfig:
    """Knobs mirroring UniformProjection/EdgeAwareProjection ctors."""
    proj_max_iters: int = 10
    proj_tolerance: float = 5e-5
    knn_k: int = 8
    sample_iters: int = 1
    # edge-aware extras (levelset_sampling.py:448-470)
    sharpness_angle: float = 15.0
    edge_sensitivity: float = 1.0
    repulsion_mu: float = 0.5
    upsample_ratio: float = 1.5

    @property
    def sharpness_sigma(self) -> float:
        return 1.0 - math.cos(self.sharpness_angle / 180.0 * math.pi)


# ---------------------------------------------------------------------------
# Newton projection (levelset_sampling.py:290-351)
# ---------------------------------------------------------------------------

def _newton_loop(sdf_fn, points, mask, max_iters, tolerance, step_clip):
    """Masked Newton while_loop; returns (points, sdf, grad)."""
    sdf0, grad0 = sdf_and_grad(sdf_fn, points)

    def cond(state):
        _, sdf, _, it = state
        return (it < max_iters) & jnp.any((jnp.abs(sdf) > tolerance) & mask)

    def body(state):
        pts, sdf, grad, it = state
        active = (jnp.abs(sdf) > tolerance) & mask
        ssg = jnp.sum(grad * grad, axis=-1, keepdims=True)
        move = sdf[..., None] * grad / eps_denom(ssg, 1e-17)
        mnorm = jnp.linalg.norm(move, axis=-1, keepdims=True)
        move = move / jnp.maximum(mnorm, 1e-15) * jnp.minimum(mnorm, step_clip)
        # non-finite moves (e.g. ∇|x| at x=0 inside a box SDF) -> no-op
        move = jnp.where(jnp.isfinite(move), move, 0.0)
        pts = jnp.where(active[..., None], pts - move, pts)
        sdf, grad = sdf_and_grad(sdf_fn, pts)
        return pts, sdf, grad, it + 1

    pts, sdf, grad, _ = jax.lax.while_loop(
        cond, body, (points, sdf0, grad0, jnp.int32(0)))
    return pts, sdf, grad


def project_points_newton(sdf_fn: SDFFn, points: jax.Array, mask: jax.Array,
                          max_iters: int = 10, tolerance: float = 5e-5,
                          step_clip: float = 0.1,
                          mesh=None, sdf_fn_coarse: Optional[SDFFn] = None,
                          coarse_iters: int = 0,
                          coarse_tolerance: float = 1e-3) -> ProjectionResult:
    """Project points onto the zero level set: p ← p − f·∇f/|∇f|².

    Each Newton move is norm-clamped to `step_clip` (reference :336-342).
    Runs as a masked while_loop; one SDF fwd+vjp per iteration.

    Hybrid precision schedule (the trace path's coarse/fine recipe,
    CLAUDE.md): with `sdf_fn_coarse` and `coarse_iters` > 0, up to
    `coarse_iters` Newton steps run on the coarse fn (e.g. the bf16
    fused kernel) to `coarse_tolerance` — roughly the bf16 noise floor
    — and the standard fine loop finishes from there. The convergence
    decision (`mask` of the result) ALWAYS comes from fine-precision
    values; coarse == fine reproduces the plain path exactly up to the
    iteration split (tested in test_levelset.py).

    With `mesh` (a jax.sharding.Mesh of >1 devices) the point axis is
    sharded over the mesh — the green-field "points sharded over chips"
    axis of BASELINE.md config 5. Projection is pointwise so shards
    need no communication, and each shard's while_loop early-exits
    independently (a strict win over the full-width loop). Per-point
    results are bit-identical to the unsharded path because updates
    are masked per point.
    """
    if mesh is not None and mesh.devices.size > 1:
        return _project_points_newton_sharded(
            sdf_fn, points, mask, mesh, max_iters=max_iters,
            tolerance=tolerance, step_clip=step_clip,
            sdf_fn_coarse=sdf_fn_coarse, coarse_iters=coarse_iters,
            coarse_tolerance=coarse_tolerance)
    if coarse_iters > 0 and sdf_fn_coarse is not None:
        points, _, _ = _newton_loop(sdf_fn_coarse, points, mask,
                                    coarse_iters,
                                    max(coarse_tolerance, tolerance),
                                    step_clip)
    pts, sdf, grad = _newton_loop(sdf_fn, points, mask, max_iters,
                                  tolerance, step_clip)
    valid = (jnp.abs(sdf) <= tolerance) & mask
    return ProjectionResult(points=pts, normals=grad, mask=valid)


def _project_points_newton_sharded(sdf_fn, points, mask, mesh,
                                   max_iters, tolerance, step_clip,
                                   sdf_fn_coarse=None, coarse_iters=0,
                                   coarse_tolerance=1e-3
                                   ) -> ProjectionResult:
    """shard_map wrapper: P axis split over the mesh, capacity padded
    up to a multiple of the device count (padding masked out)."""
    from jax import shard_map
    from jax.sharding import PartitionSpec

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    b, p, _ = points.shape
    p_pad = -(-p // n_dev) * n_dev
    if p_pad != p:
        points = jnp.concatenate(
            [points, jnp.zeros((b, p_pad - p, 3), points.dtype)], axis=1)
        mask = jnp.concatenate(
            [mask, jnp.zeros((b, p_pad - p), bool)], axis=1)

    def body(pts, m):
        return project_points_newton(sdf_fn, pts, m, max_iters=max_iters,
                                     tolerance=tolerance,
                                     step_clip=step_clip,
                                     sdf_fn_coarse=sdf_fn_coarse,
                                     coarse_iters=coarse_iters,
                                     coarse_tolerance=coarse_tolerance)

    spec = PartitionSpec(None, axis)
    fn = shard_map(body, mesh=mesh, in_specs=(spec, spec),
                   out_specs=ProjectionResult(spec, spec, spec),
                   check_vma=False)
    res = fn(points, mask)
    if p_pad != p:
        res = ProjectionResult(res.points[:, :p], res.normals[:, :p],
                               res.mask[:, :p])
    return res


# ---------------------------------------------------------------------------
# Repulsion resampling (levelset_sampling.py:239-288)
# ---------------------------------------------------------------------------

def resample_repulsion(sdf_fn: SDFFn, points: jax.Array, normals: jax.Array,
                       mask: jax.Array, cfg: ProjectionConfig,
                       mesh=None) -> ProjectionResult:
    """Uniformize iso-points: density-weighted tangential repulsion move
    followed by a 3-iteration re-projection, `sample_iters` times."""
    if cfg.sample_iters == 0:
        return ProjectionResult(points, normals, mask)

    diag = _cloud_diag(points, mask)
    inv_sigma_spatial = (num_valid(mask).astype(jnp.float32) /
                         eps_denom(diag, 1e-12))[:, None, None]

    def one_iter(carry, _):
        pts, nrm, m = carry
        unit_n = nrm / jnp.maximum(jnp.linalg.norm(nrm, axis=-1, keepdims=True), 1e-15)
        res = knn_points(pts, pts, m, m, k=cfg.knn_k, exclude_self=True)
        nn = knn_gather(pts, res.idx)
        nn_n = knn_gather(unit_n, res.idx)
        diff = pts[:, :, None, :] - nn
        d2 = jnp.sum(diff * diff, axis=-1)
        w = jnp.where(res.mask, jnp.exp(-d2 * inv_sigma_spatial), 0.0)
        density = jnp.sum(w, axis=-1, keepdims=True) + 1.0
        # tangential component of the neighbor offsets
        diff_proj = diff - jnp.sum(diff * nn_n, axis=-1, keepdims=True) * nn_n
        move = density * jnp.sum(w[..., None] * diff_proj, axis=-2) / \
            eps_denom(jnp.sum(w, axis=-1, keepdims=True), 1e-17)
        pts = jnp.where(m[..., None], pts + move, pts)
        proj = project_points_newton(sdf_fn, pts, m, max_iters=3,
                                     tolerance=cfg.proj_tolerance, mesh=mesh)
        return (proj.points, proj.normals, m), proj.mask

    (pts, nrm, m), masks = jax.lax.scan(
        one_iter, (points, normals, mask), None, length=cfg.sample_iters)
    return ProjectionResult(pts, nrm, masks[-1])


# per-batch masked bbox diagonal — single canonical helper in ops.points
_cloud_diag = _bbox_diag


# ---------------------------------------------------------------------------
# Saliency-guided insertion (levelset_sampling.py:172-237)
# ---------------------------------------------------------------------------

def insert_around_salient(points: jax.Array, mask: jax.Array,
                          ref_points: jax.Array, ref_metric: jax.Array,
                          ref_mask: jax.Array, patch_size: int = 8,
                          max_parents: int = 64) -> Tuple[jax.Array, jax.Array]:
    """Children = (2·father + mother)/3 around high-metric ref points.

    Fathers = existing points within 2·avg_spacing of a top-metric ref
    point; mothers = each father's `patch_size` nearest neighbors.

    Returns (children (B, max_parents*patch_size, 3), child_mask).
    """
    b = points.shape[0]
    n_ref = jnp.maximum(num_valid(ref_mask).astype(jnp.float32), 1.0)
    diag = _cloud_diag(points, mask)
    avg_spacing = jnp.sqrt(diag / n_ref)  # (B,)

    # top-salient reference points: threshold min(2*median, 0.5*max)
    metric = jnp.where(ref_mask, ref_metric, -jnp.inf)
    med = jnp.nanmedian(jnp.where(ref_mask, ref_metric, jnp.nan), axis=-1)
    thresh = jnp.minimum(2.0 * med, 0.5 * jnp.max(metric, axis=-1))
    hot = metric > thresh[:, None]
    # cap: keep the hottest `n_keep` (reference: min(50, num_ref/20))
    n_keep = jnp.maximum(jnp.minimum(50, (n_ref / 20.0).astype(jnp.int32)), 1)
    k_cap = min(50, ref_points.shape[1])
    _, hot_idx = jax.lax.top_k(jnp.where(hot, metric, -jnp.inf), k_cap)
    hot_sel = jnp.take_along_axis(metric, hot_idx, axis=1) > -jnp.inf
    hot_sel = hot_sel & (jnp.arange(k_cap)[None] < n_keep[:, None])
    hot_pts = jnp.take_along_axis(ref_points, hot_idx[..., None], axis=1)

    # fathers: points near a hot ref point
    res_ref = knn_points(points, hot_pts, mask, hot_sel, k=1)
    d_ref = res_ref.dists[..., 0]
    father = (d_ref < 4.0 * (avg_spacing ** 2)[:, None]) & (d_ref > 0) & mask & res_ref.mask[..., 0]

    # top max_parents fathers by proximity to salient refs
    score = jnp.where(father, -d_ref, -jnp.inf)
    _, f_idx = jax.lax.top_k(score, min(max_parents, points.shape[1]))
    f_ok = jnp.take_along_axis(score, f_idx, axis=1) > -jnp.inf
    f_pts = jnp.take_along_axis(points, f_idx[..., None], axis=1)  # (B,F,3)

    # mothers: patch_size nearest neighbors of each father
    res_nn = knn_points(f_pts, points, f_ok, mask, k=patch_size, exclude_self=False)
    mothers = knn_gather(points, res_nn.idx)  # (B,F,K,3)
    children = 2.0 * f_pts[:, :, None, :] / 3.0 + mothers / 3.0
    child_mask = f_ok[:, :, None] & res_nn.mask
    f = f_pts.shape[1]
    return (children.reshape(b, f * patch_size, 3),
            child_mask.reshape(b, f * patch_size))


# ---------------------------------------------------------------------------
# Edge-aware upsampling (levelset_sampling.py:527-660)
# ---------------------------------------------------------------------------

def edge_aware_upsample(sdf_fn: SDFFn, points: jax.Array, mask: jax.Array,
                        target_capacity: int, cfg: ProjectionConfig,
                        n_target: Optional[jax.Array] = None
                        ) -> Tuple[jax.Array, jax.Array]:
    """EAR upsampling: bilateral normal denoise → LOP relax (point-to-
    plane data term + density repulsion, clipped to mean NN spacing) →
    iterative edge-weighted midpoint insertion where the priority is
    (2 − ⟨n, nᵢ⟩)^edge_sensitivity · tangential clearance."""
    b, p, _ = points.shape
    cap = target_capacity
    if n_target is None:
        n_target = jnp.minimum(
            jnp.ceil(num_valid(mask) * cfg.upsample_ratio).astype(jnp.int32), cap)
    k = cfg.knn_k

    # NOTE: the denoise/LOP math below intentionally stays inline rather
    # than calling ops.points.denoise_normals_bilateral / ear_lop_move —
    # this variant shares ONE knn query across both stages and derives
    # inv_sigma from the count (levelset_sampling.py:500-598) where the
    # ops helpers use the reference's point_processing.py conventions.
    inv_sigma = (num_valid(mask).astype(jnp.float32) / 2.0)[:, None, None]
    spatial_cut = 16.0 / jnp.maximum(inv_sigma, 1e-12)

    def normals_of(pts, m):
        _, g = sdf_and_grad(sdf_fn, pts)
        g = jnp.where(jnp.isfinite(g), g, 0.0)  # non-smooth SDF corners
        return g / jnp.maximum(jnp.linalg.norm(g, axis=-1, keepdims=True), 1e-15)

    # --- LOP relaxation on the input points
    normals = normals_of(points, mask)
    res = knn_points(points, points, mask, mask, k=k, exclude_self=True)
    nn = knn_gather(points, res.idx)
    nn_norm = knn_gather(normals, res.idx)

    # bilateral denoise (denoise_normals, levelset_sampling.py:500-526)
    wn = jnp.exp(-(((1.0 - jnp.sum(nn_norm * normals[:, :, None, :], axis=-1))
                    / cfg.sharpness_sigma) ** 2))
    d2 = jnp.sum((nn - points[:, :, None, :]) ** 2, axis=-1)
    wp = jnp.where(d2 > spatial_cut, 0.0, jnp.exp(-d2 * inv_sigma))
    w = jnp.where(res.mask, wn * wp, 0.0)
    normals = jnp.sum(nn_norm * w[..., None], axis=-2) / \
        eps_denom(jnp.sum(w, axis=-1, keepdims=True), 1e-17)
    normals = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-15)

    move_clip = jnp.sqrt(jnp.maximum(
        jnp.sum(jnp.where(res.mask[..., 0], res.dists[..., 0], 0.0), axis=-1)
        / jnp.maximum(num_valid(mask).astype(jnp.float32), 1.0), 0.0))[:, None, None]
    pdiff = points[:, :, None, :] - nn
    w_lop = jnp.exp(-jnp.sum(normals[:, :, None, :] * pdiff, axis=-1) ** 2 * inv_sigma)
    w_lop = jnp.where((res.dists > spatial_cut) | ~res.mask, 0.0, w_lop)
    sw = jnp.where((res.dists > spatial_cut) | ~res.mask, 0.0,
                   jnp.exp(-res.dists * inv_sigma))
    density = jnp.sum(sw, axis=-1) + 1.0
    move_data = jnp.sum(w_lop[..., None] * pdiff, axis=-2) / \
        eps_denom(jnp.sum(w_lop, axis=-1, keepdims=True), 1e-17)
    move_repul = cfg.repulsion_mu * density[..., None] * \
        jnp.sum(sw[..., None] * (-pdiff), axis=-2) / \
        eps_denom(jnp.sum(sw, axis=-1, keepdims=True), 1e-17)

    def clip(v):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(n, 1e-15) * jnp.minimum(n, move_clip)

    points = jnp.where(mask[..., None], points - clip(move_data) - clip(move_repul),
                       points)

    # --- edge-weighted midpoint insertion rounds
    # front-compact so appends at slot `count` hit free capacity
    order = jnp.argsort(jnp.logical_not(mask), axis=-1, stable=True)
    points = jnp.take_along_axis(points, order[..., None], axis=1)
    mask = jnp.take_along_axis(mask, order, axis=1)
    buf = jnp.zeros((b, cap, 3), points.dtype).at[:, :p].set(points)
    bmask = jnp.zeros((b, cap), bool).at[:, :p].set(mask)
    max_new = max(cap // 10, 1)
    # Same hard round bound as ops/points.py upsample: degenerate
    # candidate sets (sparsity -inf / NaN normals) can shrink progress
    # to ~1 point/round and hang the device until the tunneled TPU
    # worker watchdog kills it; cap the rounds and return the honest
    # partial fill.
    max_rounds = 4 * -(-cap // max_new) + 4

    def cond(state):
        _, m, stalled, i = state
        return (jnp.any(num_valid(m) < n_target)
                & jnp.logical_not(stalled) & (i < max_rounds))

    def body(state):
        pts, m, _, i = state
        counts = num_valid(m)
        nrm = normals_of(pts, m)
        r = knn_points(pts, pts, m, m, k=k, exclude_self=True)
        knn_pts = knn_gather(pts, r.idx)
        knn_nrm = knn_gather(nrm, r.idx)
        mid = (knn_pts + 2.0 * pts[:, :, None, :]) / 3.0
        diff = mid[:, :, :, None, :] - knn_pts[:, :, None, :, :]  # (B,C,K,K,3)
        dot = (2.0 - jnp.sum(nrm[:, :, None, :] * knn_nrm, axis=-1)) ** cfg.edge_sensitivity
        dist = jnp.linalg.norm(diff, axis=-1)
        # subtract the normal component (edge-aware tangential clearance)
        dist = dist - jnp.sum((diff * knn_nrm[:, :, None, :, :]) ** 2, axis=-1)
        dist = jnp.where(r.mask[:, :, None, :], dist, jnp.inf)
        clearance = jnp.sqrt(eps_sqrt(jnp.min(dist, axis=-1), 1e-17))
        clearance = jnp.where(r.mask, clearance, -jnp.inf)
        priority = dot * clearance
        sparsity = jnp.max(priority, axis=-1)
        father_nb = jnp.argmax(priority, axis=-1)
        sparsity = jnp.where(m & jnp.isfinite(sparsity), sparsity, -jnp.inf)
        chosen = jnp.take_along_axis(
            mid, father_nb[:, :, None, None].repeat(3, -1), axis=2)[:, :, 0]

        _, top_idx = jax.lax.top_k(sparsity, max_new)
        new_pts = jnp.take_along_axis(chosen, top_idx[..., None], axis=1)
        top_ok = jnp.take_along_axis(sparsity, top_idx, axis=1) > -jnp.inf
        n_new = jnp.minimum(jnp.minimum(n_target - counts, max_new),
                            jnp.sum(top_ok.astype(jnp.int32), axis=-1))
        j = jnp.arange(max_new)[None, :]
        slots = jnp.where((j < n_new[:, None]) & top_ok, counts[:, None] + j, cap)
        pts = jax.vmap(lambda bf, s, u: bf.at[s].set(u, mode="drop"))(pts, slots, new_pts)
        new_m = jax.vmap(lambda bm, s: bm.at[s].set(True, mode="drop"))(m, slots)
        stalled = jnp.sum(num_valid(new_m)) == jnp.sum(counts)
        return pts, new_m, stalled, i + 1

    buf, bmask, _, _ = jax.lax.while_loop(
        cond, body, (buf, bmask, jnp.bool_(False), jnp.int32(0)))
    return buf, bmask


# ---------------------------------------------------------------------------
# Orchestration (levelset_sampling.py:353-440 project_points)
# ---------------------------------------------------------------------------

def project_points(sdf_fn: SDFFn, points: jax.Array, mask: jax.Array,
                   cfg: ProjectionConfig = ProjectionConfig(),
                   skip_resampling: bool = False,
                   skip_upsampling: bool = True,
                   edge_aware: bool = False,
                   ref_points: Optional[jax.Array] = None,
                   ref_metric: Optional[jax.Array] = None,
                   ref_mask: Optional[jax.Array] = None,
                   mesh=None) -> ProjectionResult:
    """Full iso-point extraction: project → resample → (insert | upsample)
    → re-project. Capacity is preserved (upsampling targets the input
    capacity; insertion appends children into free capacity)."""
    proj = project_points_newton(sdf_fn, points, mask,
                                 max_iters=cfg.proj_max_iters,
                                 tolerance=cfg.proj_tolerance, mesh=mesh)
    pts, nrm, valid = proj

    if not skip_resampling:
        pts, nrm, valid = resample_repulsion(sdf_fn, pts, nrm, valid, cfg,
                                             mesh=mesh)

    if not skip_upsampling:
        if ref_points is not None:
            # saliency insertion: children projected then appended into
            # free capacity slots
            children, cmask = insert_around_salient(
                pts, valid, ref_points, ref_metric, ref_mask)
            cproj = project_points_newton(sdf_fn, children, cmask,
                                          max_iters=10,
                                          tolerance=cfg.proj_tolerance,
                                          mesh=mesh)
            pts, valid, nrm = _append_into_capacity(
                pts, valid, nrm, cproj.points, cproj.mask, cproj.normals)
        else:
            if edge_aware:
                pts, m_up = edge_aware_upsample(sdf_fn, pts, valid,
                                                points.shape[1], cfg,
                                                n_target=num_valid(mask))
            else:
                pts, m_up = midpoint_upsample(pts, valid, points.shape[1],
                                              n_target=num_valid(mask),
                                              neighborhood_size=31)
            proj2 = project_points_newton(sdf_fn, pts, m_up, max_iters=10,
                                          tolerance=cfg.proj_tolerance,
                                          mesh=mesh)
            pts, nrm, valid = proj2

    return ProjectionResult(pts, nrm, valid)


def _append_into_capacity(pts, mask, nrm, new_pts, new_mask, new_nrm):
    """Scatter new valid entries into free capacity slots (front-compact
    both sides; drop overflow)."""
    b, cap, _ = pts.shape
    dst_order = jnp.argsort(jnp.logical_not(mask), axis=-1, stable=True)
    pts = jnp.take_along_axis(pts, dst_order[..., None], axis=1)
    nrm = jnp.take_along_axis(nrm, dst_order[..., None], axis=1)
    mask = jnp.take_along_axis(mask, dst_order, axis=1)
    counts = num_valid(mask)
    order = jnp.argsort(jnp.logical_not(new_mask), axis=-1, stable=True)
    new_pts = jnp.take_along_axis(new_pts, order[..., None], axis=1)
    new_nrm = jnp.take_along_axis(new_nrm, order[..., None], axis=1)
    new_mask = jnp.take_along_axis(new_mask, order, axis=1)
    j = jnp.arange(new_pts.shape[1])[None, :]
    slots = jnp.where(new_mask, counts[:, None] + j, cap)
    slots = jnp.where(slots < cap, slots, cap)
    pts = jax.vmap(lambda bf, s, u: bf.at[s].set(u, mode="drop"))(pts, slots, new_pts)
    nrm = jax.vmap(lambda bf, s, u: bf.at[s].set(u, mode="drop"))(nrm, slots, new_nrm)
    mask = jax.vmap(lambda bm, s: bm.at[s].set(True, mode="drop"))(mask, slots)
    return pts, mask, nrm


# ---------------------------------------------------------------------------
# Implicit-differentiation sample networks (levelset_sampling.py:1170-1403)
# ---------------------------------------------------------------------------

def sample_network(sdf_fn: SDFFn, iso_points: jax.Array) -> jax.Array:
    """Differentiable re-attachment of frozen iso-points (paper Eq. 13).

    Value == iso_points; d/dθ == −∇f/|∇f|² · ∂f/∂θ. `sdf_fn` must close
    over the parameters being differentiated.
    """
    p0 = jax.lax.stop_gradient(iso_points)
    f = sdf_fn(p0)
    _, grad = sdf_and_grad(sdf_fn, p0)
    grad = jax.lax.stop_gradient(grad)
    ssg = jnp.sum(grad * grad, axis=-1, keepdims=True)
    return p0 - (f - jax.lax.stop_gradient(f))[..., None] * \
        grad / eps_denom(ssg, 1e-17)


def directional_sample_network(sdf_fn: SDFFn, iso_points: jax.Array,
                               rays: jax.Array, cam_pos: jax.Array) -> jax.Array:
    """Differentiable depth along fixed rays (levelset_sampling.py:1370):
    t(θ) = t0 − (f − sg f)/⟨sg ∇f, ray⟩; x = cam + t·ray. Keeps the
    camera/ray dependence differentiable (IDR Eq. 3 sample network)."""
    p0 = jax.lax.stop_gradient(iso_points)
    f = sdf_fn(p0)
    _, grad = sdf_and_grad(sdf_fn, p0)
    grad = jax.lax.stop_gradient(grad)
    rays = rays / jnp.maximum(jnp.linalg.norm(rays, axis=-1, keepdims=True), 1e-15)
    ray0 = jax.lax.stop_gradient(rays)
    t0 = jnp.linalg.norm(p0 - cam_pos, axis=-1, keepdims=True)
    dot = jnp.sum(grad * ray0, axis=-1, keepdims=True)
    t = t0 - (f - jax.lax.stop_gradient(f))[..., None] / eps_denom(dot, 1e-10)
    return cam_pos + t * rays


# ---------------------------------------------------------------------------
# Bootstrap (levelset_sampling.py:1405-1445)
# ---------------------------------------------------------------------------

def sample_uniform_iso_points(sdf_fn: SDFFn, n_points: int, key: jax.Array,
                              init_points: Optional[jax.Array] = None,
                              init_mask: Optional[jax.Array] = None,
                              bounding_sphere_radius: float = 1.0,
                              cfg: ProjectionConfig = ProjectionConfig(),
                              mesh=None) -> ProjectionResult:
    """Uniform iso-point set: seeds → project → WLOP consolidate →
    midpoint-upsample to n → final project.

    `init_points` (+ optional `init_mask`) seeds the pipeline with the
    CURRENT iso-points — the reference always resamples from its
    persistent cloud (trainer.py:217-228 `_query_pcl` passes
    `init_points=self.model._points`, levelset_sampling.py:1405-1424).
    Only when no seeds exist does it bootstrap from random cube points
    (4× oversampled). Seeding matters beyond cost: on a sharpened
    trained field, random cube points mostly fail to converge within
    proj_max_iters (measured 4% yield at ablation it=1000 vs >80% from
    near-surface seeds), collapsing the resample into a degenerate
    few-hundred-point regime."""
    k1, k2 = jax.random.split(key)
    seeded = init_points is not None
    if not seeded:
        init_points = (jax.random.uniform(k1, (1, n_points * 4, 3)) - 0.5) \
            * 2.0 * bounding_sphere_radius
        init_mask = None
    mask0 = (jnp.ones(init_points.shape[:2], dtype=bool)
             if init_mask is None else init_mask)

    proj = project_points_newton(sdf_fn, init_points, mask0,
                                 max_iters=cfg.proj_max_iters,
                                 tolerance=cfg.proj_tolerance, mesh=mesh)
    inside = jnp.linalg.norm(proj.points, axis=-1) < bounding_sphere_radius
    valid = proj.mask & inside

    if seeded:
        # seeded path = the paper's own resampling recipe (the
        # reference's NOTE, levelset_sampling.py:1440-1443): seeds are
        # already near-uniform on the surface, so uniformize by
        # density-weighted tangential REPULSION instead of the
        # WLOP-consolidate/re-expand detour — fewer/cheaper programs
        # (no farthest-point scan), and r5 forensics: on the tunneled
        # TPU the 5-program wlop composition intermittently faults the
        # worker while this sequence ran 8/8 clean on the same
        # checkpoint (scripts/probe_resample_crash.py).
        import dataclasses
        rcfg = cfg if cfg.sample_iters > 0 else dataclasses.replace(
            cfg, sample_iters=3)
        pts, nrm, valid = resample_repulsion(sdf_fn, proj.points,
                                             proj.normals, valid, rcfg,
                                             mesh=mesh)
        if pts.shape[1] > n_points:
            # shrinking resample (seed capacity > target, e.g. the 8k
            # start cloud at the first 6k-point scheduler step):
            # uniform RANDOM subsample of the valid seeds down to the
            # target — repulsion has made them near-uniform, so any
            # unbiased subset stays uniform; slicing without the
            # shuffle would bias toward the cloud's storage order.
            # (midpoint_upsample requires seed width ≤ its capacity.)
            r = jax.random.uniform(k2, valid.shape)
            order = jnp.argsort(jnp.where(valid, r, 2.0), axis=-1)
            pts = jnp.take_along_axis(pts, order[..., None],
                                      axis=1)[:, :n_points]
            valid = jnp.take_along_axis(valid, order, axis=1)[:, :n_points]
        up, up_mask = midpoint_upsample(pts, valid, n_points,
                                        neighborhood_size=16)
        final = project_points_newton(sdf_fn, up, up_mask, max_iters=10,
                                      tolerance=cfg.proj_tolerance,
                                      mesh=mesh)
        return final

    ratio = max(min(0.5, n_points / init_points.shape[1]), 1e-3)
    x, x_mask = wlop(proj.points, valid, k2, ratio=ratio)
    proj2 = project_points_newton(sdf_fn, x, x_mask, max_iters=10,
                                  tolerance=cfg.proj_tolerance, mesh=mesh)
    up, up_mask = midpoint_upsample(proj2.points, proj2.mask, n_points,
                                    neighborhood_size=16)
    final = project_points_newton(sdf_fn, up, up_mask, max_iters=10,
                                  tolerance=cfg.proj_tolerance, mesh=mesh)
    return final
