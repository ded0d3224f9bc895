"""Perspective cameras in the pytorch3d screen convention.

Parity: the reference uses pytorch3d `PerspectiveCameras` throughout
(DSS/utils/dataset.py:329-341, DSS/core/camera.py). We implement the
same math as a pytree so every transform is jittable:

  - Row-vector world->view:  X_view = X_world @ R + T.
  - Screen axes: +X left, +Y up, +Z into the screen (right-handed).
  - NDC projection: x_ndc = fx * x_view / z + px, y_ndc = fy * y / z + py,
    and the rasterizer convention keeps z = view-space depth
    (pytorch3d PointsRasterizer.transform replaces projected z by view z).
  - Pixel convention: ndc = -(2*i + 1 - S)/S (pixel centers;
    rasterization_utils.cuh:8-11 with the sign flip of the screen axes).
"""

import math
from typing import Optional, Tuple

import flax.struct
import jax
import jax.numpy as jnp
from functools import partial

_einsum = partial(jnp.einsum, precision=jax.lax.Precision.HIGHEST)

from isopoints_tpu.utils import eps_denom


@flax.struct.dataclass
class PerspectiveCamera:
    """Batched perspective cameras (B cameras).

    focal_length / principal_point are in NDC units (pytorch3d
    convention); R (B,3,3), T (B,3) define X_view = X @ R + T.
    """

    R: jax.Array
    T: jax.Array
    focal_length: jax.Array    # (B, 2)
    principal_point: jax.Array  # (B, 2)
    znear: float = flax.struct.field(pytree_node=False, default=0.1)
    zfar: float = flax.struct.field(pytree_node=False, default=100.0)

    @classmethod
    def create(cls, R=None, T=None, focal_length=1.0, principal_point=(0.0, 0.0),
               batch_size: Optional[int] = None, znear: float = 0.1,
               zfar: float = 100.0) -> "PerspectiveCamera":
        if R is None:
            R = jnp.eye(3)[None]
        R = jnp.asarray(R, jnp.float32)
        if R.ndim == 2:
            R = R[None]
        b = batch_size or R.shape[0]
        if R.shape[0] == 1 and b > 1:
            R = jnp.tile(R, (b, 1, 1))
        if T is None:
            T = jnp.zeros((b, 3))
        T = jnp.asarray(T, jnp.float32)
        if T.ndim == 1:
            T = T[None]
        if T.shape[0] == 1 and b > 1:
            T = jnp.tile(T, (b, 1))
        fl = jnp.asarray(focal_length, jnp.float32)
        if fl.ndim == 0:
            fl = fl[None, None]
        if fl.ndim == 1:
            fl = fl[None]
        if fl.shape[-1] == 1:
            fl = jnp.tile(fl, (1, 2))
        if fl.shape[0] == 1 and b > 1:
            fl = jnp.tile(fl, (b, 1))
        pp = jnp.asarray(principal_point, jnp.float32)
        if pp.ndim == 1:
            pp = pp[None]
        if pp.shape[0] == 1 and b > 1:
            pp = jnp.tile(pp, (b, 1))
        return cls(R=R, T=T, focal_length=fl, principal_point=pp,
                   znear=znear, zfar=zfar)

    @property
    def batch_size(self) -> int:
        return self.R.shape[0]

    def world_to_view(self, pts: jax.Array) -> jax.Array:
        """pts (B, ..., 3) -> view coords."""
        return _einsum("b...i,bij->b...j", pts, self.R) + jnp.expand_dims(
            self.T, axis=tuple(range(1, pts.ndim - 1)))

    def view_to_world(self, pts_view: jax.Array) -> jax.Array:
        t = jnp.expand_dims(self.T, axis=tuple(range(1, pts_view.ndim - 1)))
        # R is orthonormal: R^-1 == R^T (camera_center already assumes it)
        r_inv = jnp.swapaxes(self.R, -1, -2)
        return _einsum("b...i,bij->b...j", pts_view - t, r_inv)

    def camera_center(self) -> jax.Array:
        """World-space camera centers (B, 3): C = -T @ R^T."""
        return -_einsum("bi,bji->bj", self.T, self.R)

    def project_ndc(self, pts: jax.Array, with_view_depth: bool = True) -> jax.Array:
        """World -> NDC. Returns (..., 3): [x_ndc, y_ndc, depth].

        depth = view-space z when `with_view_depth` (the rasterizer
        convention); otherwise 1/z (the raw projective output).
        """
        view = self.world_to_view(pts)
        z = eps_denom(view[..., 2:3], 1e-8)
        fl = jnp.expand_dims(self.focal_length, axis=tuple(range(1, pts.ndim - 1)))
        pp = jnp.expand_dims(self.principal_point, axis=tuple(range(1, pts.ndim - 1)))
        xy = view[..., :2] / z * fl + pp
        d = view[..., 2:3] if with_view_depth else 1.0 / z
        return jnp.concatenate([xy, d], axis=-1)

    def pixels_to_rays(self, pix_xy: jax.Array, image_size: Tuple[int, int]):
        """Pixel coords -> world rays.

        Args:
          pix_xy: (B, N, 2) pixel coordinates (x=col, y=row), pixel centers.
          image_size: (H, W).
        Returns:
          (origins (B, 3), directions (B, N, 3) unit length).
        """
        h, w = image_size
        sizes = jnp.asarray([w, h], dtype=pix_xy.dtype)
        ndc = -(2.0 * pix_xy + 1.0 - sizes) / sizes
        return self.ndc_to_rays(ndc)

    def ndc_to_rays(self, ndc_xy: jax.Array):
        """NDC points -> world rays from the camera center."""
        fl = self.focal_length[:, None, :]
        pp = self.principal_point[:, None, :]
        xy_view = (ndc_xy - pp) / fl  # at z=1
        dirs_view = jnp.concatenate([xy_view, jnp.ones_like(xy_view[..., :1])], axis=-1)
        r_inv = jnp.swapaxes(self.R, -1, -2)  # orthonormal R
        dirs_world = _einsum("bni,bij->bnj", dirs_view, r_inv)
        dirs_world = dirs_world / jnp.linalg.norm(dirs_world, axis=-1, keepdims=True)
        return self.camera_center(), dirs_world

    def view_direction(self, pts_world: jax.Array) -> jax.Array:
        """Unit vectors from camera center to world points (B, ..., 3)."""
        c = jnp.expand_dims(self.camera_center(),
                            axis=tuple(range(1, pts_world.ndim - 1)))
        d = pts_world - c
        return d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-12)


def look_at_rotation(camera_position, at=(0.0, 0.0, 0.0), up=(0.0, 1.0, 0.0)):
    """R such that camera at `camera_position` looks at `at` (pytorch3d semantics)."""
    pos = jnp.asarray(camera_position, jnp.float32)
    if pos.ndim == 1:
        pos = pos[None]
    at_ = jnp.broadcast_to(jnp.asarray(at, jnp.float32), pos.shape)
    up_ = jnp.broadcast_to(jnp.asarray(up, jnp.float32), pos.shape)
    z_axis = at_ - pos
    z_axis = z_axis / jnp.maximum(jnp.linalg.norm(z_axis, axis=-1, keepdims=True), 1e-12)
    x_axis = jnp.cross(up_, z_axis)
    x_norm = jnp.linalg.norm(x_axis, axis=-1, keepdims=True)
    # Degenerate up || z: fall back to an arbitrary orthogonal axis.
    fallback = jnp.cross(jnp.asarray([0.0, 0.0, 1.0]) + jnp.zeros_like(z_axis), z_axis)
    x_axis = jnp.where(x_norm > 1e-6, x_axis, fallback)
    x_axis = x_axis / jnp.maximum(jnp.linalg.norm(x_axis, axis=-1, keepdims=True), 1e-12)
    y_axis = jnp.cross(z_axis, x_axis)
    return jnp.stack([x_axis, y_axis, z_axis], axis=-1)  # columns = axes


def look_at_view_transform(dist, elev, azim, at=(0.0, 0.0, 0.0),
                           degrees: bool = True):
    """(R, T) for cameras on a sphere looking at `at` (pytorch3d semantics)."""
    dist = jnp.atleast_1d(jnp.asarray(dist, jnp.float32))
    elev = jnp.atleast_1d(jnp.asarray(elev, jnp.float32))
    azim = jnp.atleast_1d(jnp.asarray(azim, jnp.float32))
    b = max(dist.shape[0], elev.shape[0], azim.shape[0])
    dist, elev, azim = (jnp.broadcast_to(v, (b,)) for v in (dist, elev, azim))
    if degrees:
        elev = elev * math.pi / 180.0
        azim = azim * math.pi / 180.0
    # pytorch3d convention: azim=0 places the camera on the +z axis
    x = dist * jnp.cos(elev) * jnp.sin(azim)
    y = dist * jnp.sin(elev)
    z = dist * jnp.cos(elev) * jnp.cos(azim)
    pos = jnp.stack([x, y, z], axis=-1) + jnp.asarray(at, jnp.float32)
    R = look_at_rotation(pos, at=at)
    T = -_einsum("bi,bij->bj", pos, R)
    return R, T


class CameraSampler:
    """Random look-at camera batches (parity: DSS/core/camera.py:6-71)."""

    def __init__(self, continuous_views: int = 8, batch_size: int = 4,
                 distance_range=(5.0, 10.0), sort_distance: bool = True,
                 camera_params: Optional[dict] = None):
        self.continuous_views = continuous_views
        self.batch_size = batch_size
        self.distance_range = distance_range
        self.sort_distance = sort_distance
        self.camera_params = camera_params or {}

    def sample(self, key: jax.Array) -> PerspectiveCamera:
        k1, k2, k3, k4 = jax.random.split(key, 4)
        lo, hi = self.distance_range
        dist = jax.random.uniform(k1, (self.batch_size,), minval=lo, maxval=hi)
        if self.sort_distance:
            dist = jnp.sort(dist)[::-1]
        # reference ranges (DSS/core/camera.py:35-50): full elevation
        # sphere, symmetric azimuth, ±0.05 look-at jitter
        elev = jax.random.uniform(k2, (self.batch_size,), minval=-90.0,
                                  maxval=90.0)
        azim = jax.random.uniform(k3, (self.batch_size,), minval=-180.0,
                                  maxval=180.0)
        at = jax.random.uniform(k4, (self.batch_size, 3), minval=-0.05,
                                maxval=0.05)
        R, T = look_at_view_transform(dist, elev, azim, at=at)
        return PerspectiveCamera.create(R=R, T=T, **self.camera_params)
