"""Point-set consolidation ops: WLOP, midpoint upsampling, denoising.

Parity: reference DSS/utils/point_processing.py — `wlop` (:35),
`upsample` (:281, sparsest-midpoint insertion), `remove_outliers`
(:16), `denoise_normals` (:241), `resample_uniformly` (:126),
`upsample_ear`'s LOP move (:364). Re-designed for TPU: fixed-capacity
padded buffers + masks, `lax.while_loop` insertion rounds (the
reference grows tensors each round — we scatter into preallocated
slots, one compile), kNN via the matmul-blocked `ops.neighbors`
instead of FRNN grid hashing.
"""

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from isopoints_tpu.ops.neighbors import knn_points, knn_gather
from isopoints_tpu.ops.sampling import fps_subsample
from isopoints_tpu.utils import eps_denom, num_valid
from isopoints_tpu.utils.mathutils import local_coord_frames


def _bbox_diag(points: jax.Array, mask: jax.Array) -> jax.Array:
    """Per-batch bounding-box diagonal length (B,)."""
    big = 1e10
    m = mask[..., None]
    lo = jnp.min(jnp.where(m, points, big), axis=1)
    hi = jnp.max(jnp.where(m, points, -big), axis=1)
    return jnp.linalg.norm(hi - lo, axis=-1)


def remove_outliers(points: jax.Array, mask: jax.Array,
                    neighborhood_size: int = 16, tolerance: float = 0.05
                    ) -> jax.Array:
    """Keep points whose local variance ratio λ0/Σλ < tolerance
    (point_processing.py:16-32). Returns updated mask."""
    # include the query point in its own neighborhood (pytorch3d
    # estimate_pointcloud_local_coord_frames semantics) — required so a
    # far outlier contributes its own out-of-plane variance
    res = knn_points(points, points, mask, mask, k=neighborhood_size)
    nn = knn_gather(points, res.idx)
    evals, _ = local_coord_frames(points, nn, res.mask)
    ratio = evals[..., 0] / eps_denom(jnp.sum(evals, axis=-1), 1e-12)
    return mask & (ratio < tolerance)


@partial(jax.jit, static_argnames=("ratio", "neighborhood_size", "iters"))
def wlop(points: jax.Array, mask: jax.Array, key: jax.Array,
         ratio: float = 0.5, neighborhood_size: int = 16, iters: int = 3,
         repulsion_mu: float = 0.5) -> Tuple[jax.Array, jax.Array]:
    """Weighted locally optimal projection (point_processing.py:35-123).

    Downsamples to `ratio` of the cloud by FPS, then `iters` rounds of
    data attraction (α = θ(|ε|²)/|ε| weighted by 1/density_P) plus
    repulsion (β = θ(|δ|²)/|δ| weighted by density_X), with
    θ(r²)=exp(−16 r²/h²), h = 4·√(diag/N).

    Returns (X (B,S,3), x_mask (B,S)).
    """
    b, p, _ = points.shape
    n_pts = jnp.maximum(num_valid(mask).astype(jnp.float32), 1.0)
    diag = _bbox_diag(points, mask)
    h = 4.0 * jnp.sqrt(diag / n_pts)                       # (B,)
    theta_inv = (16.0 / eps_denom(h * h, 1e-12))[:, None, None]

    def theta(d2):
        return jnp.exp(-d2 * theta_inv)

    # FPS init + small perturbation so self-matches don't dominate
    x, x_mask, _ = fps_subsample(points, ratio, mask)
    x = x + jax.random.normal(key, x.shape) * (h[:, None, None] * 0.1)

    # density of the source cloud
    res_pp = knn_points(points, points, mask, mask, k=neighborhood_size,
                        exclude_self=True)
    density_p = jnp.sum(jnp.where(res_pp.mask, theta(res_pp.dists), 0.0),
                        axis=-1) + 1.0                      # (B, P)

    def one_iter(x, _):
        res_xp = knn_points(x, points, x_mask, mask, k=neighborhood_size)
        res_xx = knn_points(x, x, x_mask, x_mask, k=neighborhood_size,
                            exclude_self=True)
        nn_xp = knn_gather(points, res_xp.idx)              # (B,S,K,3)
        eps_v = x[:, :, None, :] - nn_xp
        nn_xx = knn_gather(x, res_xx.idx)
        delta = x[:, :, None, :] - nn_xx

        d_xp2 = jnp.sum(eps_v * eps_v, axis=-1)
        d_xx2 = jnp.sum(delta * delta, axis=-1)
        alpha = theta(d_xp2) / eps_denom(jnp.sqrt(d_xp2), 1e-12)
        beta = theta(d_xx2) / eps_denom(jnp.sqrt(d_xx2), 1e-12)
        density_x = jnp.sum(jnp.where(res_xx.mask, theta(d_xx2), 0.0),
                            axis=-1) + 1.0

        dp_at_nn = knn_gather(density_p[..., None], res_xp.idx)[..., 0]
        alpha = jnp.where(res_xp.mask, alpha / eps_denom(dp_at_nn, 1e-12), 0.0)
        beta = jnp.where(res_xx.mask, density_x[..., None] * beta, 0.0)

        term_data = jnp.sum(alpha[..., None] * nn_xp, axis=-2) / \
            eps_denom(jnp.sum(alpha, axis=-1, keepdims=True), 1e-12)
        term_repul = repulsion_mu * jnp.sum(beta[..., None] * delta, axis=-2) / \
            eps_denom(jnp.sum(beta, axis=-1, keepdims=True), 1e-12)
        x_new = term_data + term_repul
        return jnp.where(x_mask[..., None], x_new, x), None

    x, _ = jax.lax.scan(one_iter, x, None, length=iters)
    return x, x_mask


@partial(jax.jit, static_argnames=("target_capacity", "neighborhood_size"))
def midpoint_upsample(points: jax.Array, mask: jax.Array,
                      target_capacity: int,
                      n_target: Optional[jax.Array] = None,
                      neighborhood_size: int = 16
                      ) -> Tuple[jax.Array, jax.Array]:
    """Iteratively insert midpoints in the sparsest regions.

    Parity: point_processing.py:281-363 — midpoints m = (nn + 2p)/3;
    clearance of m = min distance to the K neighbors; per point keep
    the max-clearance midpoint ("father"); insert the globally
    sparsest `capacity//8` per round until each cloud reaches its
    target count. One `lax.while_loop`, scatter into preallocated
    slots (static shapes; the reference reallocates every round).

    Args:
      points: (B, P, 3); mask: (B, P).
      target_capacity: output buffer size (static) ≥ max target count.
      n_target: (B,) desired counts; defaults to target_capacity.

    Returns (points (B, target_capacity, 3), mask).
    """
    b, p, _ = points.shape
    cap = target_capacity
    if p > cap:
        # refuse to silently drop seed slots: a wider-than-capacity
        # seed means the caller wants a SHRINKING resample, which needs
        # an unbiased subset (see sample_uniform_iso_points) — not
        # whatever truncation order the buffer happens to be in.
        raise ValueError(
            f"midpoint_upsample: seed width {p} exceeds target capacity "
            f"{cap}; subsample the seeds to ≤ capacity first")
    if n_target is None:
        n_target = jnp.full((b,), cap, jnp.int32)
    n_target = jnp.minimum(n_target, cap)
    # front-compact: insertion appends at slot `count`, which must be free
    order = jnp.argsort(jnp.logical_not(mask), axis=-1, stable=True)
    points = jnp.take_along_axis(points, order[..., None], axis=1)
    mask = jnp.take_along_axis(mask, order, axis=1)
    buf = jnp.zeros((b, cap, 3), points.dtype).at[:, :p].set(points)
    bmask = jnp.zeros((b, cap), bool).at[:, :p].set(mask)
    max_new = max(cap // 8, 1)
    # STATIC round count (r5): this used to be a data-dependent
    # lax.while_loop; on the tunneled TPU the standalone upsample
    # program then intermittently faulted the worker whenever the big
    # combined train-step program had run earlier in the same process
    # (UNAVAILABLE "kernel fault", ~50-100%/invocation — bisected in
    # scripts/probe_resample_crash.py; the same values ran clean 6/6 in
    # a fresh process, and the same while_loop body runs clean INSIDE
    # the step program). A bounded scan with masked no-op rounds is a
    # fully static program — no device-evaluated cond — and covers the
    # worst case: growth is ≥2x per round (every valid point offers a
    # midpoint) until max_new caps it, so log2(max_new) doubling rounds
    # + deficit/max_new linear rounds always suffice; saturated rounds
    # insert nothing (n_new=0) and cost one no-op knn each.
    rounds = (max(1, math.ceil(math.log2(max_new + 1)))
              + -(-cap // max_new) + 2)

    def body(state, _):
        pts, m = state
        counts = num_valid(m)
        res = knn_points(pts, pts, m, m, k=neighborhood_size, exclude_self=True)
        nn = knn_gather(pts, res.idx)                        # (B,C,K,3)
        mid = (nn + 2.0 * pts[:, :, None, :]) / 3.0          # (B,C,K,3)
        # clearance: min distance from each midpoint to all K neighbors
        diff = mid[:, :, :, None, :] - nn[:, :, None, :, :]  # (B,C,K,K,3)
        d = jnp.linalg.norm(diff, axis=-1)
        d = jnp.where(res.mask[:, :, None, :], d, jnp.inf)   # ignore invalid nbrs
        clearance = jnp.min(d, axis=-1)                      # (B,C,K)
        clearance = jnp.where(res.mask, clearance, -jnp.inf)
        father_sparsity = jnp.max(clearance, axis=-1)        # (B,C)
        father_nb = jnp.argmax(clearance, axis=-1)
        father_sparsity = jnp.where(m, father_sparsity, -jnp.inf)
        father_sparsity = jnp.where(jnp.isfinite(father_sparsity),
                                    father_sparsity, -jnp.inf)

        chosen_mid = jnp.take_along_axis(
            mid, father_nb[:, :, None, None].repeat(3, -1), axis=2)[:, :, 0]  # (B,C,3)

        _, top_idx = jax.lax.top_k(father_sparsity, max_new)  # (B, max_new)
        new_pts = jnp.take_along_axis(chosen_mid, top_idx[..., None], axis=1)
        top_ok = jnp.take_along_axis(father_sparsity, top_idx, axis=1) > -jnp.inf

        n_new = jnp.minimum(n_target - counts, max_new)
        n_new = jnp.minimum(n_new, jnp.sum(top_ok.astype(jnp.int32), axis=-1))
        j = jnp.arange(max_new)[None, :]
        slots = counts[:, None] + j
        valid_new = (j < n_new[:, None]) & top_ok
        slots = jnp.where(valid_new, slots, cap)  # out-of-range -> dropped

        pts = jax.vmap(lambda bf, s, u: bf.at[s].set(u, mode="drop"))(pts, slots, new_pts)
        new_m = jax.vmap(lambda bm, s: bm.at[s].set(True, mode="drop"))(m, slots)
        return (pts, new_m), None

    (buf, bmask), _ = jax.lax.scan(body, (buf, bmask), None, length=rounds)
    return buf, bmask


def denoise_normals_bilateral(points: jax.Array, normals: jax.Array,
                              mask: jax.Array, sharpness_sigma: float = 30.0,
                              neighborhood_size: int = 16) -> jax.Array:
    """Bilateral normal mollification (point_processing.py:241-279).

    weights = exp(−((1−⟨n,nᵢ⟩)/σ_s)²) · exp(−|p−pᵢ|²·σ_sp⁻¹) with the
    reference's density-derived spatial sigma σ_sp⁻¹ = N/2 and cutoff
    |p−pᵢ|² > 16/σ_sp⁻¹.
    """
    normals = normals / jnp.maximum(jnp.linalg.norm(normals, axis=-1, keepdims=True), 1e-12)
    res = knn_points(points, points, mask, mask, k=neighborhood_size, exclude_self=True)
    nn = knn_gather(points, res.idx)
    nn_normals = knn_gather(normals, res.idx)

    wn = (1.0 - jnp.sum(nn_normals * normals[:, :, None, :], axis=-1)) / sharpness_sigma
    wn = jnp.exp(-wn * wn)
    inv_sigma_sp = (num_valid(mask).astype(jnp.float32) / 2.0)[:, None, None]
    spatial_cut = 16.0 / jnp.maximum(inv_sigma_sp, 1e-12)
    d2 = jnp.sum((nn - points[:, :, None, :]) ** 2, axis=-1)
    wp = jnp.where(d2 > spatial_cut, 0.0, jnp.exp(-d2 * inv_sigma_sp))
    w = jnp.where(res.mask, wn * wp, 0.0)
    out = jnp.sum(nn_normals * w[..., None], axis=-2) / \
        eps_denom(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
    out = out / jnp.maximum(jnp.linalg.norm(out, axis=-1, keepdims=True), 1e-12)
    return jnp.where(mask[..., None], out, normals)


def resample_uniformly(points: jax.Array, mask: jax.Array, key: jax.Array,
                       neighborhood_size: int = 8, shrink_ratio: float = 0.5,
                       repulsion_mu: float = 1.0) -> Tuple[jax.Array, jax.Array]:
    """WLOP-shrink then midpoint-upsample back to the original counts
    (point_processing.py:126-166). Output capacity == input capacity."""
    n_orig = num_valid(mask)
    x, x_mask = wlop(points, mask, key, ratio=shrink_ratio,
                     neighborhood_size=max(neighborhood_size, 16),
                     repulsion_mu=repulsion_mu)
    return midpoint_upsample(x, x_mask, points.shape[1], n_target=n_orig,
                             neighborhood_size=neighborhood_size)


def ear_lop_move(points: jax.Array, normals: jax.Array, mask: jax.Array,
                 neighborhood_size: int = 16, repulsion_mu: float = 0.4
                 ) -> jax.Array:
    """EAR's anisotropic-LOP relaxation move (upsample_ear,
    point_processing.py:400-430): data term weighted by
    exp(−⟨n, p−pᵢ⟩²·σ⁻¹) (point-to-plane), plus density-weighted
    repulsion; both move norms clipped to the mean 1-NN spacing.
    Returns the displaced points (same shape)."""
    res = knn_points(points, points, mask, mask, k=neighborhood_size + 1,
                     exclude_self=True)
    nn = knn_gather(points, res.idx)
    dists = res.dists

    diag = _bbox_diag(points, mask)
    inv_sigma = (num_valid(mask).astype(jnp.float32) / eps_denom(diag, 1e-12))[:, None, None]
    spatial_cut = 16.0 / jnp.maximum(inv_sigma, 1e-12)
    nn1 = jnp.where(res.mask[..., 0], dists[..., 0], 0.0)
    move_clip = jnp.sqrt(jnp.sum(nn1, axis=-1) /
                         jnp.maximum(num_valid(mask).astype(jnp.float32), 1.0))[:, None, None]

    pdiff = points[:, :, None, :] - nn
    w_lop = jnp.exp(-jnp.sum(normals[:, :, None, :] * pdiff, axis=-1) ** 2 * inv_sigma)
    w_lop = jnp.where((dists > spatial_cut) | ~res.mask, 0.0, w_lop)
    spatial_w = jnp.where((dists > spatial_cut) | ~res.mask, 0.0,
                          jnp.exp(-dists * inv_sigma))
    density_w = jnp.sum(spatial_w, axis=-1) + 1.0

    move_data = jnp.sum(w_lop[..., None] * pdiff, axis=-2) / \
        eps_denom(jnp.sum(w_lop, axis=-1, keepdims=True), 1e-12)
    move_repul = repulsion_mu * density_w[..., None] * \
        jnp.sum(spatial_w[..., None] * (-pdiff), axis=-2) / \
        eps_denom(jnp.sum(spatial_w, axis=-1, keepdims=True), 1e-12)

    def clip_norm(v):
        n = jnp.linalg.norm(v, axis=-1, keepdims=True)
        return v / jnp.maximum(n, 1e-12) * jnp.minimum(n, move_clip)

    move = clip_norm(move_data) + clip_norm(move_repul)
    return jnp.where(mask[..., None], points - move, points)
