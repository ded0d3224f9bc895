"""Explicit point-cloud scene model (DSS).

Parity: reference DSS/models/point_modeling.py — `Model` (:18):
learnable point positions, normals stored as azimuth/elevation angles,
per-point colors and a global size scaler; `forward` (:133) renders
RGBA via surface splatting and computes the in-mask filter;
`prune_points` (:112). Functional JAX version: parameters are a pytree
{points, normals_angles, colors, scaler}; filters are explicit masks.
"""

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isopoints_tpu.core.camera import PerspectiveCamera
from isopoints_tpu.core.cloud import PointCloud
from isopoints_tpu.ops.images import sample_image_at_ndc
from isopoints_tpu.rendering.lighting import DirectionalLights
from isopoints_tpu.rendering.rasterizer import RasterizationSettings
from isopoints_tpu.rendering.renderer import RenderOutput, render_pointcloud
from isopoints_tpu.rendering.texture import lighting_texture
from isopoints_tpu.utils.mathutils import angles_to_vectors, vectors_to_angles


class PointModelOutput(NamedTuple):
    rgba: jax.Array        # (B, S, S, 4)
    visibility: jax.Array  # (B, P)
    inmask: jax.Array      # (B, P) projected inside the gt 2D mask


@dataclass(frozen=True)
class PointModelConfig:
    n_points_per_cloud: int = 5000
    learn_normals: bool = True
    learn_colors: bool = True
    learn_size: bool = True
    shininess: float = 64.0


class PointModel:
    """Learnable splat cloud (point_modeling.py:18-110)."""

    def __init__(self, cfg: PointModelConfig = PointModelConfig(),
                 raster_settings: RasterizationSettings = RasterizationSettings()):
        self.cfg = cfg
        self.raster_settings = raster_settings

    def init(self, key: jax.Array,
             points: Optional[jax.Array] = None,
             normals: Optional[jax.Array] = None,
             colors: Optional[jax.Array] = None) -> dict:
        k1, k2 = jax.random.split(key)
        n = self.cfg.n_points_per_cloud
        if points is None:
            # init inside a 1.5-side cube (point_modeling.py:33-43)
            points = (jax.random.uniform(k1, (1, n, 3)) - 0.5) * 1.5
        if points.ndim == 2:
            points = points[None]
        if normals is None:
            d = points / jnp.maximum(
                jnp.linalg.norm(points, axis=-1, keepdims=True), 1e-12)
            normals = d
        azim, elev = vectors_to_angles(normals)
        if colors is None:
            colors = jnp.ones_like(points)
        return {
            "points": points,
            "normals_azim": azim,
            "normals_elev": elev,
            "colors": colors,
            "log_size": jnp.zeros(()),
        }

    def normals(self, params) -> jax.Array:
        return angles_to_vectors(params["normals_azim"], params["normals_elev"])

    def cloud(self, params, mask: Optional[jax.Array] = None) -> PointCloud:
        pts = params["points"]
        if mask is None:
            mask = jnp.ones(pts.shape[:2], dtype=bool)
        return PointCloud(points=pts, mask=mask, normals=self.normals(params),
                          features=params["colors"])

    def forward(self, params, camera: PerspectiveCamera,
                mask_img: Optional[jax.Array] = None,
                lights: Optional[DirectionalLights] = None,
                activation_mask: Optional[jax.Array] = None
                ) -> PointModelOutput:
        """Render RGBA + compute filters (point_modeling.py:133-221)."""
        pc = self.cloud(params, activation_mask)
        b = camera.batch_size
        if pc.batch_size == 1 and b > 1:
            tile = lambda x: None if x is None else jnp.tile(x, (b,) + (1,) * (x.ndim - 1))
            pc = PointCloud(points=tile(pc.points), mask=tile(pc.mask),
                            normals=tile(pc.normals), features=tile(pc.features))

        if lights is None:
            lights = DirectionalLights.create()
        shaded = lighting_texture(pc.points, pc.normals, lights,
                                  camera.camera_center(), pc.features,
                                  shininess=self.cfg.shininess)
        # global learnable splat-size scaler (point_modeling.py:33-43);
        # enters the rasterizer as a cutoff scale like the reference's
        # point_size_scaler
        scale = jnp.exp(params["log_size"]) if self.cfg.learn_size else None
        settings = self.raster_settings
        out = render_pointcloud(pc.with_features(shaded), camera, settings,
                                cutoff_scale=scale)
        # mask-image gradient observability channel (reference hooks the
        # rendered mask, point_modeling.py:197-221 -> DebuggingTensor
        # .img_mask_grad); identity unless debugging mode is on
        from isopoints_tpu.debug import tap_image_grad
        rgba = jnp.concatenate(
            [out.rgba[..., :3], tap_image_grad(out.rgba[..., 3:])], axis=-1)
        out = out._replace(rgba=rgba)

        if mask_img is not None:
            pix = camera.project_ndc(pc.points)[..., :2]
            inmask = sample_image_at_ndc(
                mask_img, jax.lax.stop_gradient(pix), mode="nearest")[..., 0] > 0.5
        else:
            inmask = jnp.ones(pc.mask.shape, dtype=bool)
        return PointModelOutput(rgba=out.rgba, visibility=out.visibility,
                                inmask=inmask)

    def prune_points(self, params, grad_points: jax.Array,
                     activation_mask: jax.Array) -> jax.Array:
        """Deactivate points with zero silhouette-loss gradient
        (point_modeling.py:112-131). Returns the updated mask."""
        dead = jnp.all(grad_points == 0.0, axis=-1)
        return activation_mask & ~dead

    def generate_mesh(self, params, resolution: int = 128,
                      activation_mask: Optional[jax.Array] = None):
        """Mesh the learned cloud (point-model Generator parity,
        point_modeling.py:257-288 — pymeshlab Poisson replaced by IMLS
        + marching tetrahedra, ops/imls.py)."""
        import numpy as np

        from isopoints_tpu.ops.imls import pointcloud_to_mesh

        pc = self.cloud(params, activation_mask)
        m = np.asarray(pc.mask[0])
        return pointcloud_to_mesh(np.asarray(pc.points[0])[m],
                                  np.asarray(pc.normals[0])[m],
                                  resolution=resolution)
