"""Math helpers: local frames, normals, curvature, conversions.

Parity: reference DSS/utils/mathHelper.py. The reference needs a
custom batched-SVD CUDA extension (torch-batch-svd) for 3x3
covariances; on TPU `jnp.linalg.eigh` on (…,3,3) symmetric matrices is
fused and fast, so no kernel is needed (SURVEY.md §2.1 mapping note).
"""

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from isopoints_tpu.utils import eps_denom, eps_sqrt


def pinverse(mat: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Batched pseudo-inverse via eigh for symmetric / SVD otherwise.

    Parity: mathHelper.py:28-41 (SVD pinverse with relative cutoff).
    """
    u, s, vt = jnp.linalg.svd(mat, full_matrices=False)
    cutoff = eps * jnp.max(s, axis=-1, keepdims=True)
    s_inv = jnp.where(s > cutoff, 1.0 / jnp.maximum(s, 1e-30), 0.0)
    # A = U S Vt  =>  A+ = Vt^T S^-1 U^T
    return jnp.einsum("...ji,...j,...kj->...ik", vt, s_inv, u)


def local_coord_frames(
    points: jax.Array,
    nn: jax.Array,
    nn_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Per-point curvatures + local frames from K neighbors.

    Parity: mathHelper.py:43-119 `estimate_pointcloud_local_coord_frames`
    (knn -> centered covariance -> batched SVD). Here: covariance ->
    `eigh` (ascending eigenvalues, so column 0 = normal direction,
    matching the reference's ascending-singular-value convention).

    Args:
      points: (..., P, 3) query points.
      nn: (..., P, K, 3) neighbor coordinates (typically from knn).
      nn_mask: (..., P, K) bool validity of each neighbor.

    Returns:
      curvatures: (..., P, 3) eigenvalues ascending (lambda0 = variance
        along normal; curvature proxy = l0/(l0+l1+l2)).
      frames: (..., P, 3, 3) eigenvector columns [normal, tang1, tang2].
    """
    if nn_mask is None:
        w = jnp.ones(nn.shape[:-1], nn.dtype)
    else:
        w = nn_mask.astype(nn.dtype)
    wsum = jnp.maximum(jnp.sum(w, axis=-1, keepdims=True), 1.0)
    centroid = jnp.sum(nn * w[..., None], axis=-2) / wsum
    centered = (nn - centroid[..., None, :]) * w[..., None]
    cov = jnp.einsum("...ki,...kj->...ij", centered, centered) / wsum[..., None]
    evals, evecs = jnp.linalg.eigh(cov)  # ascending
    return evals, evecs


def disambiguate_normals(normals: jax.Array, points: jax.Array,
                         viewpoint: Optional[jax.Array] = None) -> jax.Array:
    """Flip normals toward a viewpoint (default origin-outward).

    Parity: mathHelper.py:103-115 direction disambiguation.
    """
    if viewpoint is None:
        ref_dir = points  # outward from origin
    else:
        ref_dir = points - viewpoint
        ref_dir = -ref_dir  # toward viewpoint
    sign = jnp.sign(jnp.sum(normals * ref_dir, axis=-1, keepdims=True))
    sign = jnp.where(sign == 0, 1.0, sign)
    return normals * sign


def estimate_normals(points: jax.Array, nn: jax.Array,
                     nn_mask: Optional[jax.Array] = None,
                     disambiguate: bool = True) -> jax.Array:
    """Normals = smallest-eigenvalue eigenvector (mathHelper.py:122-156)."""
    _, frames = local_coord_frames(points, nn, nn_mask)
    normals = frames[..., :, 0]
    if disambiguate:
        normals = disambiguate_normals(normals, points)
    return normals


def curvature_proxy(evals: jax.Array) -> jax.Array:
    """Surface variation l0/(l0+l1+l2) in [0, 1/3]."""
    return evals[..., 0] / eps_denom(jnp.sum(evals, axis=-1), 1e-12)


def to_homogen(x: jax.Array) -> jax.Array:
    """(..., 3) -> (..., 4) with trailing 1 (mathHelper.py:186-194)."""
    return jnp.concatenate([x, jnp.ones_like(x[..., :1])], axis=-1)


def vectors_to_angles(vectors: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Unit vectors -> (azimuth, elevation) (mathHelper.py:197-205)."""
    x, y, z = vectors[..., 0], vectors[..., 1], vectors[..., 2]
    azim = jnp.arctan2(y, x)
    elev = jnp.arcsin(jnp.clip(z, -1.0, 1.0))
    return azim, elev


def angles_to_vectors(azim: jax.Array, elev: jax.Array) -> jax.Array:
    """(azimuth, elevation) -> unit vectors (mathHelper.py:208-214)."""
    ce = jnp.cos(elev)
    return jnp.stack([ce * jnp.cos(azim), ce * jnp.sin(azim), jnp.sin(elev)], axis=-1)


def ndc_to_pix(ndc_xy: jax.Array, image_size: Tuple[int, int]) -> jax.Array:
    """NDC [-1,1] -> pixel coords with pixel-center convention.

    Parity: mathHelper.py:159-169 and rasterization_utils.cuh:8-11
    (PixToNdc: ndc = (2*i + 1 - S) / S, inverted here). NDC +x is LEFT
    and +y is UP in the pytorch3d screen convention, so pixel index
    grows opposite to ndc.
    """
    h, w = image_size
    sizes = jnp.asarray([w, h], dtype=ndc_xy.dtype)
    return ((-ndc_xy) * sizes + sizes - 1.0) / 2.0


def pix_to_ndc(pix: jax.Array, image_size: Tuple[int, int]) -> jax.Array:
    """Inverse of ndc_to_pix: ndc = -(2*i + 1 - S)/S."""
    h, w = image_size
    sizes = jnp.asarray([w, h], dtype=pix.dtype)
    return -(2.0 * pix + 1.0 - sizes) / sizes


class RunningStat:
    """Masked Welford running mean/variance over per-point scalars.

    Parity: mathHelper.py:240-273 (used by the loss-weighted iso-point
    saliency metric, trainer.py:523-582). Functional update style.
    """

    def __init__(self, shape):
        self.n = jnp.zeros(shape, jnp.float32)
        self.mean = jnp.zeros(shape, jnp.float32)
        self.m2 = jnp.zeros(shape, jnp.float32)

    def update(self, value: jax.Array, mask: jax.Array) -> "RunningStat":
        m = mask.astype(jnp.float32)
        out = RunningStat(self.n.shape)
        out.n = self.n + m
        delta = value - self.mean
        out.mean = self.mean + jnp.where(out.n > 0, delta * m / jnp.maximum(out.n, 1.0), 0.0)
        out.m2 = self.m2 + delta * (value - out.mean) * m
        return out

    @property
    def variance(self) -> jax.Array:
        return self.m2 / jnp.maximum(self.n - 1.0, 1.0)
