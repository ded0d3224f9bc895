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


def pointcloud_to_mesh(points: np.ndarray, normals: np.ndarray,
                       resolution: int = 128, k: int = 8,
                       padding: float = 0.1,
                       chunk: int = 65536) -> Tuple[np.ndarray, np.ndarray]:
    """Mesh an oriented point cloud via IMLS + marching tetrahedra
    (point-model Generator parity). Host-side driver; grid SDF evals
    run jitted in chunks."""
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
