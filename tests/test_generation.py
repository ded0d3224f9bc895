"""Generator / evaluation / visualization / light-rig tests."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
from isopoints_tpu.models.fields import FieldOutput
from isopoints_tpu.models.generator import Generator, GeneratorConfig
from isopoints_tpu.models.implicit import ImplicitConfig, ImplicitModel
from isopoints_tpu.rendering.lightrigs import (
    get_light_for_view,
    get_tri_color_lights_for_view,
)
from isopoints_tpu.training.evaluation import (
    chamfer_distance,
    evaluate_mesh,
    point_face_distance,
)


class AnalyticSphereDecoder:
    def init(self, key):
        return {"r": jnp.asarray(0.5)}

    def apply(self, params, x, c=None):
        return FieldOutput(sdf=jnp.linalg.norm(x, axis=-1, keepdims=True)
                           - params["r"])

    def sdf(self, params, x, c=None):
        return self.apply(params, x).sdf[..., 0]


@pytest.fixture(scope="module")
def gen():
    model = ImplicitModel(AnalyticSphereDecoder(),
                          cfg=ImplicitConfig(proj_max_iters=20))
    g = Generator(model, GeneratorConfig(mesh_resolution=48, image_size=32,
                                         rays_per_chunk=512))
    return g, model.init(jax.random.key(0))


class TestGenerator:
    def test_generate_mesh_radius(self, gen):
        g, params = gen
        verts, faces = g.generate_mesh(params, two_stage=False)
        assert len(verts) > 100 and len(faces) > 100
        r = np.linalg.norm(verts, axis=-1)
        np.testing.assert_allclose(r.mean(), 0.5, atol=0.02)

    def test_raytrace_images(self, gen):
        g, params = gen
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        cam = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        rgba = g.raytrace_images(params, cam, image_size=32)
        assert rgba.shape == (1, 32, 32, 4)
        alpha = rgba[0, :, :, 3]
        assert alpha[16, 16] == 1.0          # center hit
        assert alpha[0, 0] == 0.0            # corner miss
        assert np.isfinite(rgba).all()

    def test_refine_mesh_reduces_sdf(self, gen):
        g, params = gen
        verts = np.random.RandomState(0).randn(64, 3).astype(np.float32)
        verts = verts / np.linalg.norm(verts, axis=-1, keepdims=True) * 0.55
        g2 = Generator(g.model, GeneratorConfig(refine_steps=100,
                                                refine_lr=1e-2))
        out = g2.refine_mesh(params, verts)
        f = g.model.sdf_fn(params)
        before = np.abs(np.asarray(f(jnp.asarray(verts)))).mean()
        after = np.abs(np.asarray(f(jnp.asarray(out)))).mean()
        assert after < before


class TestEvaluation:
    def test_chamfer_zero_for_identical(self):
        pts = jnp.asarray(np.random.RandomState(0).randn(256, 3), jnp.float32)
        m = chamfer_distance(pts, pts)
        assert m["chamfer_p"] < 1e-10

    def test_chamfer_known_offset(self):
        x = jnp.zeros((16, 3))
        y = jnp.zeros((16, 3)).at[:, 0].set(0.1)
        m = chamfer_distance(x, y)
        np.testing.assert_allclose(m["chamfer_p"], 2 * 0.01, atol=1e-6)

    def test_point_face_distance(self):
        verts = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
        faces = np.asarray([[0, 1, 2]])
        pts = np.asarray([[0.25, 0.25, 0.5], [0.25, 0.25, 0.0]], np.float32)
        d = point_face_distance(pts, verts, faces)
        np.testing.assert_allclose(d, (0.25 + 0.0) / 2, atol=1e-5)

    def test_evaluate_mesh_sphere(self, gen):
        g, params = gen
        verts, faces = g.generate_mesh(params, two_stage=False)
        # GT = exact sphere samples
        d = np.random.RandomState(0).randn(2000, 3)
        gt = (0.5 * d / np.linalg.norm(d, axis=-1, keepdims=True)).astype(np.float32)
        m = evaluate_mesh(verts, faces, gt, n_samples=2000)
        assert m["chamfer_p"] < 2e-3  # res-48 discretization floor
        assert m["point_face_rev"] < 1e-4  # point-only GT -> reverse direction


class TestLightRigs:
    def test_tri_color_shapes(self):
        R, T = look_at_view_transform([2.0, 2.0], [0.0, 30.0], [0.0, 90.0])
        cam = PerspectiveCamera.create(R=R, T=T)
        lights = get_tri_color_lights_for_view(cam)
        assert lights.diffuse_color.shape == (2, 3, 3)
        assert lights.direction.shape == (2, 3, 3)
        # classic rig: two front fills oppose the view axis, the
        # az=180° back light points along it
        view_axis = np.asarray(cam.R)[:, :, 2]
        d = np.asarray(lights.direction)
        assert (np.sum(d[:, 0] * view_axis, -1) < 0).all()
        assert (np.sum(d[:, 1] * view_axis, -1) < 0).all()
        assert (np.sum(d[:, 2] * view_axis, -1) > 0).all()

    def test_single_light(self):
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        cam = PerspectiveCamera.create(R=R, T=T)
        lights = get_light_for_view(cam, point_lights=True)
        assert lights.location.shape == (1, 1, 3)


class TestVisualize:
    def test_plot_cuts_and_quiver_html(self, tmp_path):
        from isopoints_tpu.misc.visualize import (
            plot_3D_quiver,
            plot_cuts,
            plot_iso_surface,
        )
        f = lambda x: np.linalg.norm(np.asarray(x), axis=-1) - 0.5
        p1 = str(tmp_path / "cuts.html")
        plot_cuts(f, p1, n_cuts=1, resolution=16)
        assert os.path.getsize(p1) > 1000
        p2 = str(tmp_path / "quiver.html")
        pts = np.random.RandomState(0).randn(32, 3)
        plot_3D_quiver({"iso": pts}, {"iso": pts * 0.1}, p2)
        assert os.path.getsize(p2) > 1000
        p3 = str(tmp_path / "iso.html")
        plot_iso_surface(lambda x: jnp.linalg.norm(x, axis=-1) - 0.5, p3,
                         resolution=16)
        assert os.path.getsize(p3) > 1000
