"""Scene model tests: implicit forward, point model render, combined flow.

Oracle: an analytic-sphere world — a SIREN-free lambda SDF is not
jittable into the decoder slot, so tests use a tiny trained-free
AnalyticDecoder wrapper to drive the full model plumbing with known
geometry.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
from isopoints_tpu.models.combined import CombinedConfig, CombinedModel, back_camera
from isopoints_tpu.models.fields import FieldOutput
from isopoints_tpu.models.implicit import ImplicitConfig, ImplicitModel
from isopoints_tpu.models.point import PointModel, PointModelConfig
from isopoints_tpu.ops.images import arange_pixels, sample_image_at_ndc
from isopoints_tpu.rendering.rasterizer import RasterizationSettings


class AnalyticSphereDecoder:
    """Decoder-shaped wrapper around an analytic sphere SDF with a
    learnable radius offset so gradients w.r.t. params exist."""

    def init(self, key):
        return {"r": jnp.asarray(0.5)}

    def apply(self, params, x, c=None) -> FieldOutput:
        s = jnp.linalg.norm(x, axis=-1, keepdims=True) - params["r"]
        return FieldOutput(sdf=s)

    def sdf(self, params, x, c=None):
        return self.apply(params, x).sdf[..., 0]


def make_camera(b=1, dist=2.0):
    R, T = look_at_view_transform([dist] * b, [10.0] * b, [30.0 * i for i in range(b)])
    return PerspectiveCamera.create(R=R, T=T, focal_length=2.0)


def gt_images(camera, size=32, r=0.5):
    """Render analytic gt mask/rgb by ray-sphere intersection."""
    b = camera.batch_size
    _, ndc = arange_pixels((size, size), b)
    cam = camera.camera_center()[:, None, :]
    _, dirs = camera.ndc_to_rays(ndc)
    oc = -cam
    t = jnp.sum(oc * dirs, axis=-1)
    d2 = jnp.sum(oc * oc, axis=-1) - t ** 2
    hit = (d2 <= r * r) & (t > 0)
    mask = hit.reshape(b, size, size, 1).astype(jnp.float32)
    img = jnp.tile(mask, (1, 1, 1, 3)) * jnp.asarray([0.8, 0.4, 0.2])
    return img, mask


class TestImplicitModel:
    def setup_method(self):
        self.model = ImplicitModel(AnalyticSphereDecoder(),
                                   cfg=ImplicitConfig(proj_max_iters=30))
        self.params = self.model.init(jax.random.key(0))

    def test_forward_shapes_and_surface(self):
        cam = make_camera()
        img, mask_img = gt_images(cam)
        _, ndc = arange_pixels((32, 32), 1)
        ndc = ndc[:, ::4]  # subsample rays
        out = self.model.forward(self.params, ndc, img, mask_img, cam,
                                 jax.random.key(1))
        n = ndc.shape[1]
        assert out.iso_points.shape == (1, n, 3)
        assert out.iso_rgb.shape == (1, n, 3)
        hits = np.asarray(out.iso_mask)
        assert hits.sum() > 0
        r = np.linalg.norm(np.asarray(out.iso_points), axis=-1)
        np.testing.assert_allclose(r[hits], 0.5, atol=5e-3)
        # freespace/occupancy masks partition sensibly
        assert not np.any(np.asarray(out.freespace_mask) &
                          np.asarray(out.occupancy_mask))

    def test_gradient_through_iso_points(self):
        """Implicit-diff: d(iso)/d(radius) should be ≈ +1 radially."""
        cam = make_camera()
        img, mask_img = gt_images(cam)
        _, ndc = arange_pixels((16, 16), 1)

        def loss(params):
            out = self.model.forward(params, ndc, img, mask_img, cam,
                                     jax.random.key(1))
            r = jnp.linalg.norm(out.iso_points, axis=-1)
            return jnp.sum(jnp.where(out.iso_mask, r, 0.0)) / \
                jnp.maximum(jnp.sum(out.iso_mask), 1)

        g = jax.grad(lambda p: loss(p))(self.params)
        assert abs(float(g["decoder"]["r"]) - 1.0) < 0.1

    def test_pixels_to_world_dvr(self):
        cam = make_camera()
        _, ndc = arange_pixels((16, 16), 1)
        p, m = self.model.pixels_to_world(self.params, ndc, cam, training=False)
        hits = np.asarray(m)
        assert hits.sum() > 0
        r = np.linalg.norm(np.asarray(p), axis=-1)
        np.testing.assert_allclose(r[hits], 0.5, atol=1e-2)

    def test_sample_world_points_min_sdf(self):
        cam = make_camera()
        _, ndc = arange_pixels((8, 8), 1)
        mask_gt = jnp.zeros(ndc.shape[:2], dtype=bool)
        pts, free_m, occ_m = self.model.sample_world_points(
            self.params, ndc, cam, mask_gt)
        # min-sdf candidates on central rays approach the center axis
        sdf = np.asarray(self.model.sdf_fn(self.params)(pts))
        assert sdf[np.asarray(free_m)].min() < 0.1


class TestPointModel:
    def test_render_and_filters(self):
        model = PointModel(PointModelConfig(n_points_per_cloud=512),
                           RasterizationSettings(image_size=32, tile_size=8))
        key = jax.random.key(0)
        d = jax.random.normal(key, (1, 512, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        params = model.init(key, points=0.5 * d, normals=d)
        cam = make_camera()
        img, mask_img = gt_images(cam, size=32)
        out = model.forward(params, cam, mask_img=mask_img)
        assert out.rgba.shape == (1, 32, 32, 4)
        assert np.asarray(out.visibility).sum() > 0
        # sphere points project inside the sphere mask
        inm = np.asarray(out.inmask)
        assert inm.mean() > 0.8

    def test_gradients_to_points(self):
        model = PointModel(PointModelConfig(n_points_per_cloud=128),
                           RasterizationSettings(image_size=32, tile_size=8))
        key = jax.random.key(0)
        d = jax.random.normal(key, (1, 128, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        params = model.init(key, points=0.5 * d, normals=d)
        cam = make_camera()
        target = jnp.zeros((1, 32, 32))

        def loss(p):
            out = model.forward(p, cam)
            return jnp.sum((out.rgba[..., 3] - target) ** 2)

        g = jax.grad(loss)(params)
        assert bool(jnp.any(g["points"] != 0))

    def test_img_mask_grad_capture(self, tmp_path):
        """Debug mode captures the per-pixel mask-image gradient
        (reference DebuggingTensor.img_mask_grad, DSS/__init__.py:21-31)
        and it equals d(loss)/d(alpha image)."""
        import os

        import isopoints_tpu.debug as dbg
        from isopoints_tpu.misc.visualize import plot_2D_quiver

        model = PointModel(PointModelConfig(n_points_per_cloud=128),
                           RasterizationSettings(image_size=32, tile_size=8))
        key = jax.random.key(0)
        d = jax.random.normal(key, (1, 128, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        params = model.init(key, points=0.5 * d, normals=d)
        cam = make_camera()
        target = jnp.zeros((1, 32, 32))

        def loss(p):
            out = model.forward(p, cam)
            return jnp.sum((out.rgba[..., 3] - target) ** 2)

        dbg.set_debugging_mode_(True)
        try:
            out0 = model.forward(params, cam)
            jax.grad(loss)(params)
            cap = dbg.get_debugging_tensor().img_mask_grad
            assert cap is not None and cap.shape == (1, 32, 32, 1)
            expect = np.asarray(2.0 * out0.rgba[..., 3])
            np.testing.assert_allclose(cap[..., 0], expect, atol=1e-5)
            path = os.path.join(str(tmp_path), "mask_grad.html")
            plot_2D_quiver(np.zeros((0, 2)), np.zeros((0, 2)),
                           np.zeros((32, 32)), path, mask_grad_img=cap)
            assert os.path.getsize(path) > 500
        finally:
            dbg.set_debugging_mode_(False)


class TestCombinedModel:
    def setup_method(self):
        self.model = CombinedModel(
            AnalyticSphereDecoder(),
            cfg=ImplicitConfig(proj_max_iters=30),
            combined_cfg=CombinedConfig(max_iso_per_batch=256,
                                        n_points_per_cloud=512,
                                        visibility_image_size=64),
            raster_settings=RasterizationSettings(image_size=64, tile_size=16))
        self.params = self.model.init(jax.random.key(0))

    def test_back_camera_opposite_view(self):
        cam = make_camera()
        bc = back_camera(cam)
        np.testing.assert_allclose(np.asarray(bc.camera_center()),
                                   np.asarray(cam.camera_center()), atol=1e-5)
        # view axes (3rd column) are opposite
        np.testing.assert_allclose(np.asarray(bc.R[:, :, 2]),
                                   -np.asarray(cam.R[:, :, 2]), atol=1e-6)

    def test_visible_iso_points_on_surface(self):
        pts, mask = self.model.init_points(jax.random.key(1))
        # pre-project the random cloud so visibility has a surface
        f = self.model.sdf_fn(self.params)
        from isopoints_tpu.models.levelset import project_points_newton
        proj = project_points_newton(f, pts, mask, max_iters=30)
        cam = make_camera()
        iso, nrm, m = self.model.get_visible_iso_points(
            self.params, proj.points, proj.mask, cam, jax.random.key(2))
        hits = np.asarray(m)
        assert hits.sum() > 10
        r = np.linalg.norm(np.asarray(iso), axis=-1)
        np.testing.assert_allclose(r[hits], 0.5, atol=1e-2)

    def test_forward_project_path(self):
        pts, mask = self.model.init_points(jax.random.key(1))
        f = self.model.sdf_fn(self.params)
        from isopoints_tpu.models.levelset import project_points_newton
        proj = project_points_newton(f, pts, mask, max_iters=30)
        cam = make_camera()
        img, mask_img = gt_images(cam, size=64)
        _, ndc = arange_pixels((16, 16), 1)
        out, new_pts, new_mask = self.model.forward(
            self.params, ndc, img, mask_img, cam, jax.random.key(3),
            points=proj.points, points_mask=proj.mask, project=True)
        assert np.asarray(out.iso_mask).sum() > 0
        hits = np.asarray(out.iso_mask)
        r = np.linalg.norm(np.asarray(out.iso_points), axis=-1)
        np.testing.assert_allclose(r[hits], 0.5, atol=1e-2)
        # freespace candidates have nonneg sdf bias, occupancy are interior
        assert new_pts is not None and new_pts.shape[1] == 256

    def test_forward_fallback_path(self):
        cam = make_camera()
        img, mask_img = gt_images(cam, size=64)
        _, ndc = arange_pixels((8, 8), 1)
        out, _, _ = self.model.forward(
            self.params, ndc, img, mask_img, cam, jax.random.key(3),
            points=None, points_mask=None, project=False)
        assert out.iso_points.shape == (1, 64, 3)


class TestImageOps:
    def test_sample_image_roundtrip(self):
        img = jnp.arange(16.0).reshape(1, 4, 4, 1)
        _, ndc = arange_pixels((4, 4), 1)
        vals = sample_image_at_ndc(img, ndc)
        np.testing.assert_allclose(np.asarray(vals[0, :, 0]),
                                   np.arange(16.0), atol=1e-5)


class TestOccupancyModel:
    def setup_method(self):
        from isopoints_tpu.models.occupancy import OccupancyConfig, OccupancyModel

        class AnalyticOccDecoder:
            """occupancy field returns RAW logits (fields convention:
            _split_output does not squash occupancy): inside-high."""
            def init(self, key):
                return {"r": jnp.asarray(0.5)}

            def apply(self, params, x, c=None):
                from isopoints_tpu.models.fields import FieldOutput
                logits = 20.0 * (params["r"] - jnp.linalg.norm(
                    x, axis=-1, keepdims=True))
                return FieldOutput(occupancy=logits)

        self.model = OccupancyModel(AnalyticOccDecoder())
        self.params = self.model.init(jax.random.key(0))

    def test_pixels_to_world_on_sphere(self):
        cam = make_camera()
        _, ndc = arange_pixels((16, 16), 1)
        pts, mask = self.model.pixels_to_world(self.params, ndc, cam)
        hits = np.asarray(mask)
        assert hits.sum() > 0
        r = np.linalg.norm(np.asarray(pts), axis=-1)
        np.testing.assert_allclose(r[hits], 0.5, atol=2e-2)

    def test_forward_masks_partition(self):
        from isopoints_tpu.models.occupancy import occupancy_bce_loss
        cam = make_camera()
        img, mask_img = gt_images(cam, size=16)
        _, ndc = arange_pixels((16, 16), 1)
        out = self.model.forward(self.params, ndc, mask_img, cam,
                                 jax.random.key(1))
        assert not np.any(np.asarray(out.freespace_mask) &
                          np.asarray(out.occupancy_mask))
        # BCE gradients flow to the decoder params
        def loss(params):
            o = self.model.forward(params, ndc, mask_img, cam,
                                   jax.random.key(1))
            return occupancy_bce_loss(o.logits_freespace,
                                      jnp.zeros_like(o.logits_freespace),
                                      mask=o.freespace_mask)
        g = jax.grad(loss)(self.params)
        assert np.isfinite(float(g["decoder"]["r"]))

    def test_generate_mesh(self):
        verts, faces = self.model.generate_mesh(self.params, resolution=32)
        assert len(verts) > 50
        r = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(r.mean(), 0.5, atol=0.05)


class TestRaytraceOverrides:
    def test_config_dict_flows_into_raytrace_cfg(self):
        """ImplicitConfig.raytrace overrides reach RayTracingConfig
        (lists coerced to tuples for the compaction stages)."""
        from isopoints_tpu.models.fields import SDFField
        from isopoints_tpu.models.implicit import ImplicitConfig, ImplicitModel

        m = ImplicitModel(
            SDFField(hidden_size=32, n_layers=2, num_frequencies=0),
            cfg=ImplicitConfig(raytrace={
                "sampler_fraction": 0.25,
                "trace_compact_after": [4, 8],
                "trace_compact_fraction": [0.6, 0.4],
                "fused_backstep": True,
                "sampler_coarse_margin": 2e-3,
            }))
        rc = m.raytrace_cfg
        assert rc.sampler_fraction == 0.25
        assert rc.trace_compact_after == (4, 8)
        assert rc.trace_compact_fraction == (0.6, 0.4)
        assert rc.fused_backstep is True
        assert rc.sampler_coarse_margin == 2e-3
