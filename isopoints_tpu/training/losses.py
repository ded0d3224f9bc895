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
