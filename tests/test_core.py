"""Core struct tests: PointCloud padding/masking, cameras, IO, config."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.core.cloud import PointCloud, PointCloudFilters
from isopoints_tpu.core.camera import (
    PerspectiveCamera, look_at_view_transform, CameraSampler,
)
from isopoints_tpu.utils import compact_padded, lengths_to_mask, masked_mean
from isopoints_tpu.utils.io import save_ply, read_ply
from isopoints_tpu.utils.mathutils import (
    estimate_normals, ndc_to_pix, pix_to_ndc, to_homogen,
    vectors_to_angles, angles_to_vectors,
)
from isopoints_tpu.config import load_config, save_config, AttrDict


def test_pointcloud_basic(rng):
    pts = rng.randn(2, 10, 3).astype(np.float32)
    mask = lengths_to_mask(jnp.asarray([10, 6]), 10)
    pc = PointCloud.create(pts, mask=mask)
    assert pc.batch_size == 2 and pc.capacity == 10
    np.testing.assert_array_equal(np.asarray(pc.lengths()), [10, 6])


def test_pointcloud_normalize(rng):
    pts = (rng.randn(1, 100, 3) * 5 + 3).astype(np.float32)
    pc = PointCloud.create(pts)
    pcn, center, scale = pc.normalize_to_sphere(radius=1.0)
    d = np.linalg.norm(np.asarray(pcn.points), axis=-1)
    assert d.max() <= 1.0 + 1e-5
    pcb, _, _ = pc.normalize_to_box(side=1.5)
    lo, hi = pcb.bounding_box()
    assert float(jnp.max(hi - lo)) <= 1.5 + 1e-5


def test_compact_padded():
    pts = jnp.arange(12, dtype=jnp.float32).reshape(1, 4, 3)
    mask = jnp.asarray([[False, True, False, True]])
    cpts, cmask = compact_padded(pts, mask)
    np.testing.assert_array_equal(np.asarray(cmask), [[True, True, False, False]])
    np.testing.assert_allclose(np.asarray(cpts[0, 0]), [3, 4, 5])
    np.testing.assert_allclose(np.asarray(cpts[0, 1]), [9, 10, 11])


def test_filters():
    pc = PointCloud.create(jnp.zeros((1, 5, 3)))
    f = PointCloudFilters(visibility=jnp.asarray([[True, False, True, True, False]]))
    assert int(f.filter_cloud(pc).lengths()[0]) == 3


def test_camera_roundtrip():
    R, T = look_at_view_transform(dist=2.7, elev=20.0, azim=30.0)
    cam = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
    pts = jax.random.normal(jax.random.key(0), (1, 50, 3)) * 0.3
    view = cam.world_to_view(pts)
    back = cam.view_to_world(view)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)
    # camera center maps to origin of view space
    c = cam.camera_center()
    cv = cam.world_to_view(c[:, None, :])
    np.testing.assert_allclose(np.asarray(cv), 0.0, atol=1e-5)
    # camera looks at origin: origin projects to ndc center, positive depth
    ndc = cam.project_ndc(jnp.zeros((1, 1, 3)))
    np.testing.assert_allclose(np.asarray(ndc[0, 0, :2]), 0.0, atol=1e-5)
    assert float(ndc[0, 0, 2]) > 0


def test_pixels_to_rays_hits_projection():
    """Rays through pixel p, marched to depth d, reproject to pixel p."""
    R, T = look_at_view_transform(dist=3.0, elev=10.0, azim=45.0)
    cam = PerspectiveCamera.create(R=R, T=T, focal_length=1.5)
    H = W = 64
    pix = jnp.asarray([[[10.0, 20.0], [40.0, 55.0], [32.0, 32.0]]])
    origins, dirs = cam.pixels_to_rays(pix, (H, W))
    pts = origins[:, None, :] + dirs * 2.5
    ndc = cam.project_ndc(pts)
    pix_back = ndc_to_pix(ndc[..., :2], (H, W))
    np.testing.assert_allclose(np.asarray(pix_back), np.asarray(pix), atol=1e-3)


def test_ndc_pix_roundtrip():
    pix = jnp.asarray([[0.0, 0.0], [31.5, 17.2], [63.0, 63.0]])
    ndc = pix_to_ndc(pix, (64, 64))
    back = ndc_to_pix(ndc, (64, 64))
    np.testing.assert_allclose(np.asarray(back), np.asarray(pix), atol=1e-5)


def test_angles_vectors_roundtrip():
    v = jax.random.normal(jax.random.key(0), (20, 3))
    v = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    az, el = vectors_to_angles(v)
    v2 = angles_to_vectors(az, el)
    np.testing.assert_allclose(np.asarray(v2), np.asarray(v), atol=1e-5)


def test_estimate_normals_plane(rng):
    """Points on z=0 plane -> normals ±z."""
    pts = np.concatenate([rng.rand(1, 200, 2), np.zeros((1, 200, 1))], -1).astype(np.float32)
    pts_j = jnp.asarray(pts)
    # brute-force 8-nn
    d = jnp.linalg.norm(pts_j[:, :, None] - pts_j[:, None, :], axis=-1)
    idx = jnp.argsort(d, axis=-1)[..., 1:9]
    nn = jnp.take_along_axis(pts_j[:, None], idx[..., None].repeat(3, -1), axis=2)
    normals = estimate_normals(pts_j, nn, disambiguate=False)
    nz = np.abs(np.asarray(normals)[..., 2])
    np.testing.assert_allclose(nz, 1.0, atol=1e-4)


def test_ply_roundtrip(tmp_path, rng):
    pts = rng.randn(50, 3).astype(np.float32)
    nrm = rng.randn(50, 3).astype(np.float32)
    col = rng.rand(50, 3).astype(np.float32)
    p = str(tmp_path / "test.ply")
    save_ply(p, pts, normals=nrm, colors=col, binary=True)
    data = read_ply(p)
    np.testing.assert_allclose(data["points"], pts, atol=1e-6)
    np.testing.assert_allclose(data["normals"], nrm, atol=1e-6)
    np.testing.assert_allclose(data["colors"], col, atol=1.0 / 255)
    # ascii + faces
    faces = np.asarray([[0, 1, 2], [2, 3, 4]])
    p2 = str(tmp_path / "mesh.ply")
    save_ply(p2, pts, faces=faces, binary=False)
    data2 = read_ply(p2)
    np.testing.assert_array_equal(data2["faces"], faces)


def test_config_inheritance(tmp_path):
    base = tmp_path / "base.yaml"
    child = tmp_path / "child.yaml"
    save_config(str(base), AttrDict({"model": {"type": "implicit", "hidden": 256},
                                     "training": {"lr": 1e-4}}))
    child.write_text("inherit_from: base.yaml\nmodel:\n  hidden: 128\n")
    cfg = load_config(str(child))
    assert cfg.model.type == "implicit"
    assert cfg.model.hidden == 128
    assert cfg.training.lr == 1e-4


def test_config_save_strips_inherit_and_reload(tmp_path):
    """A saved (fully-resolved) config must reload from anywhere.

    save_config strips `inherit_from` (the saved config is already
    resolved); load_config tolerates a stale inherit_from whose base is
    missing (configs saved before the strip, e.g. in out/ dirs)."""
    base = tmp_path / "base.yaml"
    child = tmp_path / "child.yaml"
    save_config(str(base), AttrDict({"model": {"type": "combined"}}))
    child.write_text("inherit_from: base.yaml\nmodel:\n  hidden: 64\n")
    cfg = load_config(str(child))
    # resolved save into a different dir: inherit_from must be gone
    outdir = tmp_path / "out"
    outdir.mkdir()
    saved = outdir / "config.yaml"
    cfg["inherit_from"] = "base.yaml"  # simulate a resolved cfg that kept it
    save_config(str(saved), cfg)
    import yaml
    assert "inherit_from" not in yaml.safe_load(saved.read_text())
    cfg2 = load_config(str(saved))
    assert cfg2.model.type == "combined" and cfg2.model.hidden == 64
    # pre-fix saved config (stale inherit_from, base unreachable):
    # loads with a warning instead of crashing
    stale = outdir / "stale.yaml"
    stale.write_text("inherit_from: base_missing.yaml\nmodel:\n  type: point\n")
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cfg3 = load_config(str(stale))
    assert cfg3.model.type == "point"
    assert any("fully resolved" in str(x.message) for x in w)


def test_camera_sampler():
    cams = CameraSampler(batch_size=4, distance_range=(2.0, 4.0)).sample(jax.random.key(0))
    assert cams.batch_size == 4
    # all look roughly at origin: origin projects near the ndc center,
    # within the reference's ±0.05 look-at jitter (DSS camera.py:35-50)
    ndc = cams.project_ndc(jnp.zeros((4, 1, 3)))
    assert float(jnp.abs(ndc[..., :2]).max()) < 0.06
    d = np.linalg.norm(np.asarray(cams.camera_center()), axis=-1)
    assert (d >= 2.0 - 1e-5).all() and (d <= 4.0 + 1e-5).all()


class TestDTUCameraDecomposition:
    def test_krt_roundtrip_and_projection(self, tmp_path):
        """Synthetic DTU cameras.npz: P = K[R|t] must decompose back and
        the resulting PerspectiveCamera must project a known world point
        to the analytically-computed pixel (dataset.py:300-341 parity)."""
        import os
        from isopoints_tpu.data.dataset import DTUDataset

        h = w = 64
        K = np.array([[80.0, 0.0, 31.0],
                      [0.0, 82.0, 33.5],
                      [0.0, 0.0, 1.0]], np.float32)
        # rotation around y + translation
        th = 0.3
        R = np.array([[np.cos(th), 0, np.sin(th)],
                      [0, 1, 0],
                      [-np.sin(th), 0, np.cos(th)]], np.float32)
        t = np.array([0.1, -0.2, 2.0], np.float32)
        P = K @ np.concatenate([R, t[:, None]], axis=1)

        d = tmp_path / "dtu"
        (d / "image").mkdir(parents=True)
        (d / "mask").mkdir()
        from isopoints_tpu.utils.io import save_image
        img = np.ones((h, w, 3), np.float32)
        save_image(str(d / "image" / "0.png"), img)
        save_image(str(d / "mask" / "0.png"), img[..., 0])
        np.savez(str(d / "cameras.npz"),
                 world_mat_0=np.concatenate([P, [[0, 0, 0, 1]]], 0),
                 scale_mat_0=np.eye(4, dtype=np.float32))

        ds = DTUDataset(str(d))
        K2 = ds.intrinsics[0]
        np.testing.assert_allclose(K2, K, atol=1e-3)

        cam = ds.camera([0], (h, w))
        # project a world point both ways
        X = np.array([0.2, 0.1, 1.0], np.float32)
        x_h = P @ np.append(X, 1.0)
        u, v = x_h[0] / x_h[2], x_h[1] / x_h[2]   # pixel coords (col, row)

        import jax.numpy as jnp
        from isopoints_tpu.ops.images import ndc_to_pix_coords
        ndc = cam.project_ndc(jnp.asarray(X)[None, None])[0, 0, :2]
        pix = np.asarray(ndc_to_pix_coords(ndc[None], (h, w)))[0]
        # K places pixel centers at i+0.5; this framework's convention
        # puts them at integer i — a fixed half-pixel offset
        np.testing.assert_allclose(pix, [u - 0.5, v - 0.5], atol=0.05)


class TestPinverse:
    def test_matches_numpy_pinv(self):
        from isopoints_tpu.utils.mathutils import pinverse
        rng = np.random.RandomState(0)
        # general batch + symmetric PSD batch (the heat-kernel use case)
        a = rng.randn(4, 5, 5).astype(np.float32)
        psd = np.einsum("bij,bkj->bik", a, a)
        for mats in (a, psd):
            got = np.asarray(pinverse(jnp.asarray(mats)))
            want = np.linalg.pinv(mats)
            np.testing.assert_allclose(got, want, atol=1e-3)
