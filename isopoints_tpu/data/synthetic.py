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
    # GT surface samples (the reference dataset ships points/normals in
    # data_dict.npz, DSS/utils/dataset.py:49-69) — used for saliency
    # seeding and mesh-eval chamfer during validation
    from isopoints_tpu.models.levelset import project_points_newton

    init = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 8192, 3)), jnp.float32)
    proj = project_points_newton(sdf_fn, init, jnp.ones((1, 8192), bool),
                                 max_iters=30, tolerance=1e-5)
    ok = np.asarray(proj.mask[0])
    gt_points = np.asarray(proj.points[0])[ok]
    gt_normals = np.asarray(proj.normals[0])[ok]
    gt_normals = gt_normals / np.maximum(
        np.linalg.norm(gt_normals, axis=-1, keepdims=True), 1e-12)
    return {
        "img.rgb": np.concatenate(rgbs),
        "img.mask": np.concatenate(masks),
        "camera_mat": np.stack(cam_mats),
        "focal_length": np.asarray([focal, focal], np.float32),
        "principal_point": np.zeros(2, np.float32),
        "points": gt_points.astype(np.float32),
        "normals": gt_normals.astype(np.float32),
    }


def normalize_mesh(verts: np.ndarray, radius: float = 1.0) -> np.ndarray:
    """Center at the bbox midpoint and scale the max vertex norm to
    `radius` (create_mvr_data_from_mesh.py:117-121 unit-sphere
    normalization)."""
    verts = np.asarray(verts, np.float32)
    center = (verts.max(0) + verts.min(0)) / 2.0
    verts = verts - center
    scale = np.linalg.norm(verts, axis=-1).max()
    return verts * (radius / max(scale, 1e-12))


def render_mesh_view(verts: jax.Array, faces: jax.Array,
                     camera: PerspectiveCamera, image_size: int,
                     lights: Optional[DirectionalLights] = None,
                     base_color=(0.8, 0.5, 0.3)) -> Dict[str, np.ndarray]:
    """Ray-cast one batch of views of a triangle mesh into
    rgb+mask+depth images (flat shading — reference HardFlatShader,
    create_mvr_data_from_mesh.py:152-156)."""
    from isopoints_tpu.ops.raymesh import ray_mesh_intersect

    b = camera.batch_size
    _, ndc = arange_pixels((image_size, image_size), b)
    cam_pos = camera.camera_center()[:, None, :]
    _, dirs = camera.ndc_to_rays(ndc)
    origins = jnp.broadcast_to(cam_pos, dirs.shape)
    res = ray_mesh_intersect(origins, dirs, verts, faces)
    mask = res.hit
    if lights is None:
        lights = DirectionalLights.create()
    rgb_pts = lighting_texture(res.points, res.normals, lights,
                               camera.camera_center(),
                               jnp.broadcast_to(jnp.asarray(base_color),
                                                res.points.shape))
    rgb = jnp.where(mask[..., None], jnp.clip(rgb_pts, 0.0, 1.0), 1.0)
    # dense depth: distance along the (unit) ray; zfar fill like the
    # reference's cams.zfar (create_mvr_data_from_mesh.py:215-218)
    depth = jnp.where(mask, res.t, 100.0)
    s = image_size
    return {
        "img.rgb": np.asarray(rgb.reshape(b, s, s, 3), np.float32),
        "img.mask": np.asarray(mask.reshape(b, s, s, 1), np.float32),
        "img.depth": np.asarray(depth.reshape(b, s, s, 1), np.float32),
    }


def make_mesh_mvr(verts: np.ndarray, faces: np.ndarray, n_views: int = 24,
                  image_size: int = 64, dist: float = 2.0,
                  focal: float = 2.0, seed: int = 0, batch: int = 4,
                  norm_radius: float = 0.7, n_gt_points: int = 20000,
                  normalize: bool = True) -> Dict[str, np.ndarray]:
    """In-memory MVR dataset rendered from an arbitrary triangle mesh
    (reference scripts/create_mvr_data_from_mesh.py, which this module
    previously only matched for analytic SDFs — VERDICT r1 item 7).

    The mesh is normalized into the unit sphere (`norm_radius` < 1
    keeps it comfortably inside the tracer's bounding sphere), rendered
    with the framework's own camera/ray/lighting stack, and GT surface
    samples (area-weighted, with face normals) are attached the same
    way the reference ships `points`/`normals` in data_dict.npz
    (:169-176).
    """
    from isopoints_tpu.utils.meshing import sample_points_from_mesh

    verts = normalize_mesh(verts, norm_radius) if normalize \
        else np.asarray(verts, np.float32)
    faces = np.asarray(faces)
    verts_j = jnp.asarray(verts)
    faces_j = jnp.asarray(faces, jnp.int32)

    rng = np.random.RandomState(seed)
    elev = rng.uniform(-45.0, 45.0, size=n_views)
    azim = np.linspace(0.0, 360.0, n_views, endpoint=False)
    rgbs, masks, depths, cam_mats = [], [], [], []
    for i in range(0, n_views, batch):
        sl = slice(i, min(i + batch, n_views))
        R, T = look_at_view_transform([dist] * (sl.stop - sl.start),
                                      elev[sl], azim[sl])
        cam = PerspectiveCamera.create(R=R, T=T, focal_length=focal)
        out = render_mesh_view(verts_j, faces_j, cam, image_size)
        rgbs.append(out["img.rgb"])
        masks.append(out["img.mask"])
        depths.append(out["img.depth"])
        for j in range(sl.stop - sl.start):
            m = np.eye(4, dtype=np.float32)
            m[:3, :3] = np.asarray(R[j])
            m[3, :3] = np.asarray(T[j])
            cam_mats.append(m)

    gt_points, gt_normals = sample_points_from_mesh(
        verts, faces, n_gt_points, seed=seed)
    return {
        "img.rgb": np.concatenate(rgbs),
        "img.mask": np.concatenate(masks),
        "img.depth": np.concatenate(depths),
        "camera_mat": np.stack(cam_mats),
        "focal_length": np.asarray([focal, focal], np.float32),
        "principal_point": np.zeros(2, np.float32),
        "points": gt_points,
        "normals": gt_normals,
        "mesh_verts": verts,
        "mesh_faces": faces.astype(np.int64),
    }


def make_synthetic_dtu(sdf_fn: Callable, out_dir: str, n_views: int = 8,
                       image_size: int = 64, dist: float = 2.0,
                       focal_pix: Optional[float] = None,
                       seed: int = 0,
                       scale_mat: Optional[np.ndarray] = None) -> None:
    """Write a synthetic dataset in the IDR/DTU layout the `DTUDataset`
    loader expects (reference DSS/utils/dataset.py:231-377): image/,
    mask/, cameras.npz with `world_mat_%d` = K[R|t] column-convention
    projections and `scale_mat_%d`, plus points.ply GT samples.

    `scale_mat` (4,4): the IDR normalized->world similarity. When
    given, `world_mat_i` is written as P_norm @ inv(scale_mat) so the
    loader's P = world_mat @ scale_mat recovers the same normalized-
    coordinate cameras (images identical), while the GT points.ply is
    emitted in WORLD coordinates — exercising the reference's
    generate-time denormalization (generate_mvr.py:76-78) end to end.
    Default None writes identity (data already in the unit box).

    Consistency by construction: the world matrices are written first,
    then the images are RENDERED with the cameras `DTUDataset.camera`
    decomposes back out of them — the same round trip `train_mvr.py`
    takes on real DTU scans.
    """
    from isopoints_tpu.models.levelset import project_points_newton
    from isopoints_tpu.utils.io import save_ply

    h = w = image_size
    f = focal_pix if focal_pix is not None else image_size  # ~53° fov
    K = np.array([[f, 0.0, w / 2.0],
                  [0.0, f, h / 2.0],
                  [0.0, 0.0, 1.0]], np.float32)
    rng = np.random.RandomState(seed)
    elev = rng.uniform(-30.0, 30.0, size=n_views)
    azim = np.linspace(0.0, 360.0, n_views, endpoint=False)
    R_row, T_row = look_at_view_transform([dist] * n_views, elev, azim)
    if scale_mat is None:
        scale_mat = np.eye(4, dtype=np.float32)
    scale_mat = np.asarray(scale_mat, np.float32)
    scale_inv = np.linalg.inv(scale_mat).astype(np.float32)
    cams_npz = {}
    for i in range(n_views):
        # loader convention: decomposed R is column world->view and the
        # camera uses R.T (row-vector) — so write R_dec = R_row.T
        R_dec = np.asarray(R_row[i]).T
        t = np.asarray(T_row[i])
        P = K @ np.concatenate([R_dec, t[:, None]], axis=1)   # (3, 4)
        wm = np.eye(4, dtype=np.float32)
        wm[:3, :4] = P
        # world_mat projects WORLD points; the loader recovers the
        # normalized-coordinate projection as world_mat @ scale_mat
        cams_npz[f"world_mat_{i}"] = wm @ scale_inv
        cams_npz[f"scale_mat_{i}"] = scale_mat

    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)
    np.savez(os.path.join(out_dir, "cameras.npz"), **cams_npz)
    # placeholder images so the loader can enumerate views
    blank = np.zeros((h, w), np.float32)
    for i in range(n_views):
        save_image(os.path.join(out_dir, "image", f"{i:06d}.png"), blank)
        save_image(os.path.join(out_dir, "mask", f"{i:06d}.png"), blank)

    from isopoints_tpu.data.dataset import DTUDataset

    ds = DTUDataset(out_dir)
    key = jax.random.key(seed)
    for i in range(n_views):
        cam = ds.camera([i], (h, w))
        key, sub = jax.random.split(key)
        out = render_view(sdf_fn, cam, image_size, sub)
        save_image(os.path.join(out_dir, "image", f"{i:06d}.png"),
                   out["img.rgb"][0])
        save_image(os.path.join(out_dir, "mask", f"{i:06d}.png"),
                   out["img.mask"][0][..., 0])

    init = jnp.asarray(rng.uniform(-0.9, 0.9, (1, 4096, 3)), jnp.float32)
    proj = project_points_newton(sdf_fn, init, jnp.ones((1, 4096), bool),
                                 max_iters=30, tolerance=1e-5)
    ok = np.asarray(proj.mask[0])
    # GT scan lives in WORLD coordinates (like a real DTU scan): apply
    # the normalized->world scale_mat to surface points, its rotation
    # part (scale cancels in normalization) to normals
    pts_n = np.asarray(proj.points[0])[ok]
    nrm_n = np.asarray(proj.normals[0])[ok]
    pts_w = pts_n @ scale_mat[:3, :3].T + scale_mat[:3, 3]
    nrm_w = nrm_n @ np.linalg.inv(scale_mat[:3, :3]).astype(np.float32)
    nrm_w /= np.maximum(np.linalg.norm(nrm_w, axis=-1, keepdims=True), 1e-12)
    save_ply(os.path.join(out_dir, "points.ply"), pts_w, normals=nrm_w)


def export_mvr_dataset(data: Dict[str, np.ndarray], out_dir: str) -> None:
    """Write the MVRDataset directory layout (image/, mask/[, depth/],
    data_dict.npz[, mesh.ply]) — create_mvr_data_from_mesh.py parity
    (:96-100 directories, :228-246 per-view files + npz)."""
    from isopoints_tpu.utils.io import save_ply

    os.makedirs(os.path.join(out_dir, "image"), exist_ok=True)
    os.makedirs(os.path.join(out_dir, "mask"), exist_ok=True)
    n = data["img.rgb"].shape[0]
    for i in range(n):
        save_image(os.path.join(out_dir, "image", f"{i:05d}.png"),
                   data["img.rgb"][i])
        save_image(os.path.join(out_dir, "mask", f"{i:05d}.png"),
                   data["img.mask"][i][..., 0])
        if "img.depth" in data:
            os.makedirs(os.path.join(out_dir, "depth"), exist_ok=True)
            np.save(os.path.join(out_dir, "depth", f"{i:05d}.npy"),
                    data["img.depth"][i])
    extra = {k: data[k] for k in ("points", "normals") if k in data}
    np.savez(os.path.join(out_dir, "data_dict.npz"),
             camera_mat=data["camera_mat"],
             focal_length=data["focal_length"],
             principal_point=data["principal_point"], **extra)
    if "mesh_verts" in data:
        # ship the normalized GT mesh like the reference's mesh.obj
        # (create_mvr_data_from_mesh.py:123) — used for mesh eval
        save_ply(os.path.join(out_dir, "mesh.ply"), data["mesh_verts"],
                 faces=data["mesh_faces"])
