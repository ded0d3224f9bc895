"""Implicit moving least squares: point cloud -> signed distance field.

Parity: the reference point-model Generator meshes its cloud with
pymeshlab screened Poisson (point_modeling.py:265-288). TPU-native
equivalent: an IMLS signed field from oriented points — at query x,
the normal-weighted average of point-to-plane distances
d(x) = Σ wᵢ⟨x−pᵢ, nᵢ⟩ / Σ wᵢ with Gaussian weights over the k nearest
points — evaluated on a grid and meshed with marching tetrahedra
(utils/meshing.py, native C++ path). Also used by the RIMLS machinery
of point_processing.project_to_latent_surface (:168-237).
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isopoints_tpu.ops.neighbors import knn_gather, knn_points
from isopoints_tpu.utils import eps_denom


@partial(jax.jit, static_argnames=("k",))
def imls_sdf(query: jax.Array, points: jax.Array, normals: jax.Array,
             mask: Optional[jax.Array] = None, k: int = 8,
             sigma_scale: float = 2.0) -> jax.Array:
    """IMLS signed distance of query points to an oriented cloud.

    Args:
      query: (B, N, 3); points/normals: (B, P, 3); mask: (B, P).
    Returns (B, N) signed distances (positive along normals).
    """
    if mask is None:
        mask = jnp.ones(points.shape[:2], dtype=bool)
    res = knn_points(query, points, None, mask, k=k)
    nn = knn_gather(points, res.idx)                       # (B, N, K, 3)
    nnn = knn_gather(normals, res.idx)
    nnn = nnn / jnp.maximum(jnp.linalg.norm(nnn, axis=-1, keepdims=True), 1e-12)
    # bandwidth from the local spacing (nearest-neighbor distance)
    h2 = jnp.maximum(res.dists[..., :1], 1e-12) * sigma_scale ** 2
    w = jnp.where(res.mask, jnp.exp(-res.dists / h2), 0.0)  # (B, N, K)
    d_plane = jnp.sum((query[:, :, None, :] - nn) * nnn, axis=-1)
    sdf = jnp.sum(w * d_plane, axis=-1) / eps_denom(jnp.sum(w, axis=-1), 1e-12)
    # far-field fallback: unsigned distance keeps the field monotone
    far = jnp.sqrt(jnp.maximum(res.dists[..., 0], 0.0))
    no_support = jnp.sum(w, axis=-1) < 1e-12
    return jnp.where(no_support, far, sdf)


@partial(jax.jit, static_argnames=("k", "iters", "weight_iters"))
def project_to_latent_surface(points: jax.Array, normals: jax.Array,
                              mask: Optional[jax.Array] = None,
                              k: int = 16, iters: int = 2,
                              weight_iters: int = 3,
                              sharpness_sigma: float = 0.75
                              ) -> jax.Array:
    """RIMLS projection of points onto the cloud's latent MLS surface.

    Parity: DSS/utils/point_processing.py `project_to_latent_surface`
    (:168-237): for each point, iterate robust re-weighting (spatial
    Gaussian x normal-bilateral x residual weights) of its neighbors'
    point-to-plane offsets, then move the point along the averaged
    normal by the weighted mean residual; `iters` outer moves.
    """
    if mask is None:
        mask = jnp.ones(points.shape[:2], dtype=bool)
    unit = lambda v: v / jnp.maximum(
        jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    nrm = unit(normals)
    inv_sig_n = 1.0 / (sharpness_sigma * sharpness_sigma)

    def outer(x, _):
        # self-projection: exclude the zero-distance self match, else it
        # collapses the bandwidth and dominates the weights
        res = knn_points(x, points, mask, mask, k=k, exclude_self=True)
        nn = knn_gather(points, res.idx)                   # (B,P,K,3)
        nn_n = knn_gather(nrm, res.idx)
        h2 = jnp.maximum(res.dists[..., :1] * 2.0, 1e-12)  # local spacing²
        w_sp = jnp.where(res.mask, jnp.exp(-res.dists / h2), 0.0)
        diff = x[:, :, None, :] - nn
        f = jnp.sum(diff * nn_n, axis=-1)                  # plane residuals

        def wstep(w, _):
            # residual-robust re-weighting (RIMLS inner loop :191-237)
            mean_f = jnp.sum(w * f, axis=-1, keepdims=True) / \
                eps_denom(jnp.sum(w, axis=-1, keepdims=True), 1e-12)
            w_res = jnp.exp(-((f - mean_f) ** 2) / jnp.maximum(h2, 1e-12))
            avg_n = unit(jnp.sum(w[..., None] * nn_n, axis=-2))
            w_n = jnp.exp(-jnp.sum((nn_n - avg_n[:, :, None, :]) ** 2, -1)
                          * inv_sig_n)
            return jnp.where(res.mask, w_sp * w_res * w_n, 0.0), None

        w, _ = jax.lax.scan(wstep, w_sp, None, length=weight_iters)
        avg_n = unit(jnp.sum(w[..., None] * nn_n, axis=-2))
        move = jnp.sum(w * f, axis=-1) / eps_denom(jnp.sum(w, axis=-1), 1e-12)
        x = jnp.where(mask[..., None], x - move[..., None] * avg_n, x)
        return x, None

    out, _ = jax.lax.scan(outer, points, None, length=iters)
    return out


def pointcloud_to_mesh(points: np.ndarray, normals: np.ndarray,
                       resolution: int = 128, k: int = 8,
                       padding: float = 0.1) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh an oriented point cloud via IMLS + marching tetrahedra
    (point-model Generator parity). Grid evaluation chunking is handled
    by utils.meshing.eval_sdf_grid."""
    pts = jnp.asarray(points, jnp.float32)[None]
    nrm = jnp.asarray(normals, jnp.float32)[None]
    lo = np.asarray(points).min(axis=0) - padding
    hi = np.asarray(points).max(axis=0) + padding

    from isopoints_tpu.utils.meshing import extract_mesh

    def f(x):
        shp = x.shape[:-1]
        flat = x.reshape(1, -1, 3)
        return imls_sdf(flat, pts, nrm, k=k).reshape(shp)

    return extract_mesh(f, resolution=resolution, bbox_min=tuple(lo),
                        bbox_max=tuple(hi))
