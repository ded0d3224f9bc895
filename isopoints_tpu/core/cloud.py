"""Padded point-cloud structure + named filters.

Parity: reference DSS/core/cloud.py (`PointClouds3D`,
`PointCloudsFilters`). Redesigned for TPU: a single immutable pytree
with fixed-capacity padded arrays `(B, P, C)` and a validity mask
`(B, P)` — no list/packed representations, no in-place mutation. All
"update_*" operations return new structs; capacity changes are
explicit (`utils.resize_padded`).
"""

from typing import Optional

import flax.struct
import jax
import jax.numpy as jnp

from isopoints_tpu.utils import compact_padded, masked_mean, num_valid


@flax.struct.dataclass
class PointCloud:
    """Batched padded point cloud.

    Attributes:
      points:   (B, P, 3) float world/object coordinates.
      mask:     (B, P) bool validity.
      normals:  (B, P, 3) float or None.
      features: (B, P, C) float or None (colors etc.).
    """

    points: jax.Array
    mask: jax.Array
    normals: Optional[jax.Array] = None
    features: Optional[jax.Array] = None

    @classmethod
    def create(cls, points, normals=None, features=None, mask=None) -> "PointCloud":
        points = jnp.asarray(points)
        if points.ndim == 2:
            points = points[None]
            normals = None if normals is None else jnp.asarray(normals)[None]
            features = None if features is None else jnp.asarray(features)[None]
            mask = None if mask is None else jnp.asarray(mask)[None]
        if mask is None:
            mask = jnp.ones(points.shape[:2], dtype=bool)
        return cls(points=points, mask=mask, normals=normals, features=features)

    @property
    def batch_size(self) -> int:
        return self.points.shape[0]

    @property
    def capacity(self) -> int:
        return self.points.shape[1]

    def lengths(self) -> jax.Array:
        return num_valid(self.mask)

    def with_points(self, points) -> "PointCloud":
        return self.replace(points=points)

    def with_normals(self, normals) -> "PointCloud":
        return self.replace(normals=normals)

    def with_features(self, features) -> "PointCloud":
        return self.replace(features=features)

    def with_mask(self, mask) -> "PointCloud":
        return self.replace(mask=mask)

    def compact(self) -> "PointCloud":
        """Move valid points to the front (stable order)."""
        order = jnp.argsort(jnp.logical_not(self.mask), axis=-1, stable=True)
        def g(x):
            return None if x is None else jnp.take_along_axis(x, order[..., None], axis=1)
        return self.replace(
            points=g(self.points),
            normals=g(self.normals),
            features=g(self.features),
            mask=jnp.take_along_axis(self.mask, order, axis=1),
        )

    def bounding_box(self):
        """Masked per-batch min/max corners: ((B,3), (B,3))."""
        big = jnp.asarray(jnp.finfo(self.points.dtype).max)
        m = self.mask[..., None]
        lo = jnp.min(jnp.where(m, self.points, big), axis=1)
        hi = jnp.max(jnp.where(m, self.points, -big), axis=1)
        return lo, hi

    def normalize_to_sphere(self, radius: float = 1.0):
        """Center + scale so valid points fit in a sphere (cloud.py:147-175).

        Returns (cloud, center (B,1,3), scale (B,1,1)); x' = (x-c)/s*r.
        """
        center = masked_mean(self.points, self.mask, axis=1, keepdims=True)
        d = jnp.linalg.norm(self.points - center, axis=-1)
        d = jnp.where(self.mask, d, 0.0)
        scale = jnp.max(d, axis=1, keepdims=True)[..., None] / radius
        scale = jnp.maximum(scale, 1e-12)
        pts = (self.points - center) / scale
        return self.replace(points=pts), center, scale

    def normalize_to_box(self, side: float = 2.0):
        """Center + scale so the bbox fits in a cube of `side` (cloud.py:177-208)."""
        lo, hi = self.bounding_box()
        center = ((lo + hi) / 2.0)[:, None, :]
        scale = (jnp.max(hi - lo, axis=-1) / side)[:, None, None]
        scale = jnp.maximum(scale, 1e-12)
        pts = (self.points - center) / scale
        return self.replace(points=pts), center, scale

    def subsample_randomly(self, key: jax.Array, ratio: float) -> "PointCloud":
        """Keep each valid point with prob `ratio` (cloud.py:260-286)."""
        keep = jax.random.uniform(key, self.mask.shape) < ratio
        return self.with_mask(self.mask & keep).compact()


@flax.struct.dataclass
class PointCloudFilters:
    """Named boolean masks over a padded cloud.

    Parity: reference DSS/core/cloud.py:289-367 (`PointCloudsFilters`
    with `inmask`, `activation`, `visibility`).
    """

    inmask: Optional[jax.Array] = None       # (B, P)
    activation: Optional[jax.Array] = None   # (B, P)
    visibility: Optional[jax.Array] = None   # (B, P)

    def combined(self, base_mask: jax.Array) -> jax.Array:
        m = base_mask
        for f in (self.inmask, self.activation, self.visibility):
            if f is not None:
                m = m & f
        return m

    def filter_cloud(self, pc: PointCloud) -> PointCloud:
        return pc.with_mask(self.combined(pc.mask))
