"""Synthetic MVR data generation.

Parity: reference scripts/create_mvr_data_from_mesh.py (renders a mesh
with pytorch3d into the MVRDataset layout). TPU-native version:
ray-trace an ANALYTIC SDF (sphere/torus/box — no mesh dependency) with
the framework's own ray engine and Phong shading to produce
image/mask/camera batches, in memory or exported to the MVRDataset
directory layout. Gives CI a fully self-contained MVR workload
(the reference's data ships out-of-repo in data.zip).
"""

import os
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
from isopoints_tpu.models.fields import sdf_and_grad
from isopoints_tpu.models.raytracing import RayTracingConfig, ray_trace
from isopoints_tpu.ops.images import arange_pixels
from isopoints_tpu.rendering.lighting import DirectionalLights
from isopoints_tpu.rendering.texture import lighting_texture
from isopoints_tpu.utils.io import save_image


def sphere_sdf(r: float = 0.5):
    return lambda x: jnp.linalg.norm(x, axis=-1) - r


def torus_sdf(R: float = 0.4, r: float = 0.15):
    def f(x):
        q = jnp.stack([jnp.linalg.norm(x[..., :2], axis=-1) - R, x[..., 2]], -1)
        return jnp.linalg.norm(q, axis=-1) - r
    return f


def box_sdf(half: float = 0.35):
    def f(x):
        q = jnp.abs(x) - half
        return (jnp.linalg.norm(jnp.maximum(q, 0.0), axis=-1)
                + jnp.minimum(jnp.max(q, axis=-1), 0.0))
    return f


def render_view(sdf_fn: Callable, camera: PerspectiveCamera,
                image_size: int, key: jax.Array,
                lights: Optional[DirectionalLights] = None,
                base_color=(0.8, 0.5, 0.3)) -> Dict[str, np.ndarray]:
    """Ray-trace one batch of views into rgb+mask images."""
    b = camera.batch_size
    _, ndc = arange_pixels((image_size, image_size), b)
    cam_pos = camera.camera_center()[:, None, :]
    _, dirs = camera.ndc_to_rays(ndc)
    res = ray_trace(sdf_fn, cam_pos, dirs,
                    jnp.ones(dirs.shape[:-1], dtype=bool), key,
                    RayTracingConfig(sphere_tracing_iters=30),
                    training=False)
    mask = res.network_object_mask
    _, grads = sdf_and_grad(sdf_fn, res.points)
    normals = grads / jnp.maximum(
        jnp.linalg.norm(grads, axis=-1, keepdims=True), 1e-12)
    if lights is None:
        # default rig == DirectionalLights.create() defaults, so a model
        # trained with default lighting can actually match the GT shading
        lights = DirectionalLights.create()
    rgb_pts = lighting_texture(res.points, normals, lights,
                               camera.camera_center(),
                               jnp.broadcast_to(jnp.asarray(base_color),
                                                res.points.shape))
    rgb = jnp.where(mask[..., None], jnp.clip(rgb_pts, 0.0, 1.0), 1.0)
    s = image_size
    return {
        "img.rgb": np.asarray(rgb.reshape(b, s, s, 3), np.float32),
        "img.mask": np.asarray(mask.reshape(b, s, s, 1), np.float32),
    }


def make_synthetic_mvr(sdf_fn: Callable, n_views: int = 24,
                       image_size: int = 64, dist: float = 2.0,
                       focal: float = 2.0, seed: int = 0,
                       batch: int = 8) -> Dict[str, np.ndarray]:
    """In-memory MVR dataset: images, masks, camera matrices."""
    rng = np.random.RandomState(seed)
    elev = rng.uniform(-45.0, 45.0, size=n_views)
    azim = np.linspace(0.0, 360.0, n_views, endpoint=False)
    rgbs, masks, cam_mats = [], [], []
    key = jax.random.key(seed)
    for i in range(0, n_views, batch):
        sl = slice(i, min(i + batch, n_views))
        R, T = look_at_view_transform([dist] * (sl.stop - sl.start),
                                      elev[sl], azim[sl])
        cam = PerspectiveCamera.create(R=R, T=T, focal_length=focal)
        key, sub = jax.random.split(key)
        out = render_view(sdf_fn, cam, image_size, sub)
        rgbs.append(out["img.rgb"])
        masks.append(out["img.mask"])
        for j in range(sl.stop - sl.start):
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = np.asarray(R[j])
            m[3, :3] = np.asarray(T[j])
            cam_mats.append(m)
    return {
        "img.rgb": np.concatenate(rgbs),
        "img.mask": np.concatenate(masks),
        "camera_mat": np.stack(cam_mats),
        "focal_length": np.asarray([focal, focal], np.float32),
        "principal_point": np.zeros(2, np.float32),
    }


def export_mvr_dataset(data: Dict[str, np.ndarray], out_dir: str) -> None:
    """Write the MVRDataset directory layout (image/, mask/,
    data_dict.npz) — create_mvr_data_from_mesh.py parity."""
    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)
    n = data["img.rgb"].shape[0]
    for i in range(n):
        save_image(os.path.join(out_dir, "image", f"{i:05d}.png"),
                   data["img.rgb"][i])
        save_image(os.path.join(out_dir, "mask", f"{i:05d}.png"),
                   data["img.mask"][i][..., 0])
    np.savez(os.path.join(out_dir, "data_dict.npz"),
             camera_mat=data["camera_mat"],
             focal_length=data["focal_length"],
             principal_point=data["principal_point"])
