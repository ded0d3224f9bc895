"""Loss zoo.

Parity: reference DSS/training/losses.py — eikonal `NormalLengthLoss`
(:74), `NormalLoss`/`CosSimilarityLoss` (:86/:105), `SmapeLoss` (:117),
`L1/L2` (:131/:140), RIMLS `ProjectionLoss` (:282), `RepulsionLoss`
(:406), `IouLoss` (:518), `SDF2DLoss` BCE freespace/occupancy (:601) —
plus the SAL/SALD space losses used by the point-cloud workload
(test_dtu_points.py:414-430). Functional: every loss takes arrays +
mask and returns (per-element loss, mask) or a reduced scalar.
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from isopoints_tpu.debug import tap_grad
from isopoints_tpu.ops.neighbors import knn_points, knn_gather
from isopoints_tpu.utils import eps_denom, eps_sqrt, num_valid


def reduce_loss(x: jax.Array, mask: Optional[jax.Array] = None,
                reduction: str = "mean") -> jax.Array:
    if mask is None:
        mask = jnp.ones(x.shape, dtype=bool)
    m = mask.astype(x.dtype)
    if reduction == "sum":
        return jnp.sum(x * m)
    if reduction == "mean":
        return jnp.sum(x * m) / jnp.maximum(jnp.sum(m), 1.0)
    if reduction == "none":
        return x * m
    raise ValueError(reduction)


# --- basic regressions ------------------------------------------------------

def l1_loss(pred, target, mask=None, reduction="mean"):
    return reduce_loss(jnp.sum(jnp.abs(pred - target), axis=-1)
                       if pred.ndim > (mask.ndim if mask is not None else pred.ndim - 1)
                       else jnp.abs(pred - target), mask, reduction)


def l2_loss(pred, target, mask=None, reduction="mean"):
    d = pred - target
    d = jnp.sum(d * d, axis=-1) if d.ndim > (mask.ndim if mask is not None else d.ndim - 1) else d * d
    return reduce_loss(d, mask, reduction)


def smape_loss(pred, target, mask=None, reduction="mean", eps=1e-8):
    """Symmetric mean absolute percentage (losses.py:117-128)."""
    d = jnp.abs(pred - target) / (jnp.abs(pred) + jnp.abs(target) + eps)
    if d.ndim > (mask.ndim if mask is not None else d.ndim):
        d = jnp.mean(d, axis=-1)
    return reduce_loss(d, mask, reduction)


# --- SDF losses -------------------------------------------------------------

def eikonal_loss(grad: jax.Array, mask=None, reduction="mean"):
    """(|∇f| − 1)² (NormalLengthLoss, losses.py:74-84)."""
    n = jnp.linalg.norm(grad, axis=-1)
    return reduce_loss((n - 1.0) ** 2, mask, reduction)


def normal_cos_loss(pred_normals, gt_normals, mask=None, reduction="mean",
                    absolute: bool = True):
    """1 − |cos(n_pred, n_gt)| (CosSimilarityLoss, losses.py:105-115;
    absolute variant as in test_dtu_points.py:380-385)."""
    a = pred_normals / jnp.maximum(jnp.linalg.norm(pred_normals, axis=-1, keepdims=True), 1e-12)
    b = gt_normals / jnp.maximum(jnp.linalg.norm(gt_normals, axis=-1, keepdims=True), 1e-12)
    cos = jnp.sum(a * b, axis=-1)
    if absolute:
        cos = jnp.abs(cos)
    return reduce_loss(1.0 - cos, mask, reduction)


def sdf_freespace_loss(sdf: jax.Array, alpha: float = 1.0, mask=None,
                       reduction="sum"):
    """BCE(−α·sdf, 0): freespace points must have positive sdf
    (SDF2DLoss, losses.py:601-651 + trainer.py:604-632)."""
    logits = -alpha * sdf
    loss = jax.nn.softplus(logits)  # BCE with target 0
    return reduce_loss(loss, mask, reduction)


def sdf_occupancy_loss(sdf: jax.Array, alpha: float = 1.0, mask=None,
                       reduction="sum"):
    """BCE(−α·sdf, 1): occupied points must have negative sdf."""
    logits = -alpha * sdf
    loss = jax.nn.softplus(-logits)  # BCE with target 1
    return reduce_loss(loss, mask, reduction)


def sal_space_loss(sdf: jax.Array, dist_to_cloud: jax.Array, mask=None,
                   reduction="mean"):
    """SAL unsigned-distance match: (√d_nn − |f|)²
    (test_dtu_points.py:414-418)."""
    return reduce_loss((jnp.sqrt(eps_sqrt(dist_to_cloud)) - jnp.abs(sdf)) ** 2,
                       mask, reduction)


def exp_space_loss(sdf: jax.Array, alpha: float = 100.0, mask=None,
                   reduction="mean"):
    """IGR-style off-surface repulsion exp(−α|f|)
    (test_dtu_points.py:420-421)."""
    return reduce_loss(jnp.exp(-alpha * jnp.abs(sdf)), mask, reduction)


def sald_offnormal_loss(grad: jax.Array, gt_normals: jax.Array, mask=None,
                        reduction="mean"):
    """SALD: min(|∇f−n|, |∇f+n|)² for open surfaces
    (test_dtu_points.py:425-430)."""
    d1 = jnp.sum((grad - gt_normals) ** 2, axis=-1)
    d2 = jnp.sum((grad + gt_normals) ** 2, axis=-1)
    return reduce_loss(jnp.minimum(d1, d2), mask, reduction)


def iou_loss(pred: jax.Array, target: jax.Array, reduction="mean"):
    """Negative intersection-over-union (losses.py:518-535)."""
    dims = tuple(range(1, pred.ndim))
    inter = jnp.sum(pred * target, axis=dims)
    union = jnp.sum(pred + target - pred * target, axis=dims)
    return reduce_loss(-inter / eps_denom(union, 1e-12), reduction=reduction)


# --- RIMLS surface losses (DSS point-model regularizers) --------------------

def _rimls_weights(points, normals, mask, knn_k=32, filter_scale=2.0,
                   sharpness_sigma=0.75):
    """Shared weight computation for Projection/Repulsion losses
    (SurfaceLoss, losses.py:149-276): phi = (1−d²/s)⁴ low-pass with
    s = 2·d_nn1·scale², bilateral normal weights, two rounds of normal
    mollification."""
    res = knn_points(points, points, mask, mask, k=knn_k, exclude_self=True)
    nn = knn_gather(points, res.idx)
    d2 = res.dists

    spacing = d2[:, :, :1] * 2.0  # local point spacing² = 2·d(nn1)²
    s = spacing * filter_scale * filter_scale
    phi = jnp.maximum(1.0 - d2 / eps_denom(s, 1e-12), 0.0)
    phi = (phi * phi) ** 2
    phi = jnp.where(res.mask, phi, 0.0)

    def denoise(nrm, w):
        knn_n = knn_gather(nrm, res.idx)
        out = jnp.sum(knn_n * w[..., None], axis=-2) / \
            eps_denom(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
        return out

    normals = denoise(normals, phi)
    inv_sig_n = 1.0 / (sharpness_sigma * sharpness_sigma)
    unit = lambda v: v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    knn_n = knn_gather(unit(normals), res.idx)
    dn = knn_n - unit(normals)[:, :, None, :]
    normal_w = jnp.exp(-jnp.sum(dn * dn, axis=-1) * inv_sig_n)
    normals = denoise(normals, phi * normal_w)

    # reference cutoff: dists > filter_scale * d(nn1)^2 * 2
    # (losses.py:349,:420); spacing is already 2*d(nn1)^2
    ball = d2 > (filter_scale * spacing)
    weights = jnp.where(ball | ~res.mask, 0.0, phi * normal_w)
    return res, nn, normals, normal_w, weights, ball


def projection_loss(points, normals, mask, knn_k=32, filter_scale=2.0,
                    sharpness_sigma=0.75, reduction="mean"):
    """RIMLS weighted point-to-plane distance² (ProjectionLoss,
    losses.py:282-404). Gradients flow to `points` only."""
    res, nn, nrm_dn, _, weights, _ = _rimls_weights(
        jax.lax.stop_gradient(points), jax.lax.stop_gradient(normals),
        mask, knn_k, filter_scale, sharpness_sigma)
    knn_n = knn_gather(nrm_dn, res.idx)
    points = tap_grad("proj", points)
    dist = jnp.sum((jax.lax.stop_gradient(nn) - points[:, :, None, :]) * knn_n,
                   axis=-1)
    d = jnp.sum(weights * dist, axis=-1) / eps_denom(jnp.sum(weights, axis=-1), 1e-12)
    return reduce_loss(d * d, mask, reduction)


def repulsion_loss(points, normals, mask, knn_k=32, filter_scale=2.0,
                   sharpness_sigma=0.75, reduction="mean"):
    """Maximize weighted point-to-point distances after projecting onto
    the local plane (RepulsionLoss, losses.py:406-515)."""
    sg = jax.lax.stop_gradient
    res, nn, nrm_dn, normal_w, weights, ball = _rimls_weights(
        sg(points), sg(normals), mask, knn_k, filter_scale, sharpness_sigma)
    knn_n = knn_gather(nrm_dn, res.idx)
    points = tap_grad("repel", points)
    dist_plane = jnp.sum((sg(nn) - points[:, :, None, :]) * knn_n, axis=-1)
    deltap = jnp.sum(dist_plane[..., None] * weights[..., None] * knn_n, axis=-2) / \
        eps_denom(jnp.sum(weights, axis=-1, keepdims=True), 1e-12)
    proj = points + deltap

    inv_sigma_sp = (2.0 / jnp.maximum(num_valid(mask).astype(jnp.float32), 1.0)
                    )[:, None, None]
    dd = sg(nn) - sg(proj)[:, :, None, :]
    spatial_w = jnp.exp(-jnp.sum(dd * dd, axis=-1) / eps_denom(inv_sigma_sp, 1e-12))
    density_w = jnp.sum(spatial_w, axis=-1, keepdims=True) + 1.0
    w = jnp.where(ball | ~res.mask, 0.0, normal_w * spatial_w * density_w)

    diff = proj[:, :, None, :] - sg(nn)
    p2p = jnp.sum(diff * diff, axis=-1)
    loss = -jnp.sum(p2p * w, axis=(-1, -2)) / eps_denom(jnp.sum(w, axis=(-1, -2)), 1e-12)
    return reduce_loss(loss, reduction=reduction)


_SDL_ANCHORS = ((2.17, 1.83, 2.41), (1.79, 2.31, 1.97), (2.43, 2.09, 1.73))


def signed_distance_loss(points: jax.Array, sdf: jax.Array,
                         verts: jax.Array, faces: jax.Array,
                         mask: Optional[jax.Array] = None,
                         reduction: str = "mean",
                         anchors: Tuple = _SDL_ANCHORS,
                         face_chunk: int = 2048) -> jax.Array:
    """Supervise predicted SDF values with the GT mesh's signed distance
    (SignedDistanceLoss, losses.py:536-599): loss = (sign·dist − sdf)².

    Sign: the reference rasterizes the mesh from a camera at (2,2,2)
    and takes the parity of a 4-deep zbuf at each point's pixel. Here
    the same inside/outside parity is computed EXACTLY: count
    Möller–Trumbore crossings of the segment point→anchor (each anchor
    a point known to lie outside); odd = inside. A segment grazing a
    shared mesh edge counts both incident triangles and flips parity,
    so the sign is a MAJORITY VOTE over 3 asymmetric anchors (an edge
    graze needs 2/3 degenerate directions to win). Magnitude: exact
    per-pair point-triangle distance (pytorch3d point_face_distance
    parity). Gradients flow to `sdf` and `points` (the sign is
    stop-gradient, like the reference's no_grad block,
    losses.py:551-578).

    points: (P, 3); sdf: (P,); verts: (V, 3); faces: (F, 3) int.
    All-static shapes; faces are scanned in `face_chunk` blocks so the
    (P, F) pair matrix never materializes.
    """
    from isopoints_tpu.training.evaluation import point_tri_sq_dists

    pts = jnp.asarray(points, jnp.float32)
    tri = jnp.asarray(verts, jnp.float32)[jnp.asarray(faces, jnp.int32)]
    f_total = tri.shape[0]
    fc = min(face_chunk, f_total)
    f_pad = -(-f_total // fc) * fc
    if f_pad > f_total:
        # pad by REPEATING the first triangle (degenerate pad triangles
        # poison the backward pass with 0·NaN); repeats are excluded
        # from both the distance min and the parity count via `valid`
        tri = jnp.concatenate(
            [tri, jnp.broadcast_to(tri[:1], (f_pad - f_total, 3, 3))])
    tri_c = tri.reshape(-1, fc, 3, 3)
    bases = jnp.arange(tri_c.shape[0], dtype=jnp.int32) * fc

    sg = jax.lax.stop_gradient
    pts_sg = sg(pts)
    anch = jnp.asarray(anchors, jnp.float32)                 # (A, 3)
    # the parity vote is only sound if every anchor lies OUTSIDE the
    # mesh; the defaults sit at radius ~3.7 (unit-box assumption, like
    # the reference's fixed camera). For meshes that extend past that
    # (e.g. unnormalized DTU world coords), scale all anchors out
    # radially so they clear the bounding sphere (advisor r3 finding).
    vmax = jnp.max(jnp.linalg.norm(sg(jnp.asarray(verts, jnp.float32)),
                                   axis=-1))
    amin = jnp.min(jnp.linalg.norm(anch, axis=-1))
    anch = anch * jnp.maximum(1.0, 1.25 * vmax / amin)
    seg = anch[:, None, :] - pts_sg[None]                    # (A, P, 3)

    def body(carry, chunk):
        cnt, dmin = carry
        tri_k, base = chunk
        valid = base + jnp.arange(fc, dtype=jnp.int32) < f_total
        av, bv, cv = tri_k[:, 0], tri_k[:, 1], tri_k[:, 2]
        d2 = point_tri_sq_dists(pts, av, bv, cv)             # (P, fc)
        dmin = jnp.minimum(dmin, jnp.min(
            jnp.where(valid[None], d2, jnp.inf), axis=-1))
        # segment crossing count (Möller–Trumbore, t ∈ (eps, 1]),
        # batched over anchors
        e1 = bv - av
        e2 = cv - av
        pvec = jnp.cross(seg[..., None, :], e2[None, None])  # (A, P, fc, 3)
        det = jnp.sum(e1[None, None] * pvec, axis=-1)
        inv = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
        tvec = pts_sg[None, :, None, :] - av[None, None]
        u = jnp.sum(tvec * pvec, axis=-1) * inv
        qvec = jnp.cross(tvec, e1[None, None])
        v = jnp.sum(seg[..., None, :] * qvec, axis=-1) * inv
        t = jnp.sum(e2[None, None] * qvec, axis=-1) * inv
        eps = 1e-7
        ok = ((jnp.abs(det) > 1e-9) & (u >= -eps) & (v >= -eps)
              & (u + v <= 1.0 + eps) & (t > 1e-6) & (t <= 1.0)
              & valid[None, None])
        cnt = cnt + jnp.sum(ok.astype(jnp.int32), axis=-1)   # (A, P)
        return (cnt, dmin), None

    init = (jnp.zeros((anch.shape[0],) + pts.shape[:1], jnp.int32),
            jnp.full(pts.shape[:1], jnp.inf, jnp.float32))
    (crossings, d2), _ = jax.lax.scan(body, init, (tri_c, bases))
    inside_votes = jnp.sum((crossings % 2 == 1).astype(jnp.int32), axis=0)
    sign = jnp.where(inside_votes * 2 > anch.shape[0], -1.0, 1.0)
    dist = sign * jnp.sqrt(eps_sqrt(d2))
    return reduce_loss((dist - sdf) ** 2, mask, reduction)
