"""Fused Pallas SDF-MLP kernels vs the reference jax fields.

Runs in pallas interpret mode on CPU; numeric oracle = the plain
models/fields.py implementations (must agree to float32 roundoff).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.models.fields import SDFField, SirenField, sdf_and_grad
from isopoints_tpu.ops.pallas_mlp import make_fused_igr_sdf, make_fused_siren_sdf


class TestFusedSiren:
    def setup_method(self):
        self.field = SirenField(hidden_size=128, n_layers=2)
        self.params = self.field.init(jax.random.key(0))
        self.ref = lambda x: self.field.sdf(self.params, x)
        # 'highest' = exact-f32 parity mode; the f32x3 default is
        # bounded separately (TestPrecisionModes)
        self.sdf, self.sdf_grad = make_fused_siren_sdf(
            self.field, self.params, interpret=True, precision="highest")

    def test_values_match(self):
        x = jax.random.normal(jax.random.key(1), (777, 3))
        np.testing.assert_allclose(np.asarray(self.sdf(x)),
                                   np.asarray(self.ref(x)), atol=1e-6)

    def test_grads_match_autodiff(self):
        x = jax.random.normal(jax.random.key(2), (333, 3))
        v_ref, g_ref = sdf_and_grad(self.ref, x)
        v, g = self.sdf_grad(x)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v_ref), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)

    def test_batched_shapes(self):
        x = jax.random.normal(jax.random.key(3), (2, 17, 5, 3))
        v = self.sdf(x)
        assert v.shape == (2, 17, 5)
        v2, g = self.sdf_grad(x)
        assert g.shape == (2, 17, 5, 3)
        np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-6)


class TestFusedIGR:
    @pytest.mark.parametrize("n_layers,skip", [(4, (4,)), (4, (2,))])
    def test_values_and_grads(self, n_layers, skip):
        field = SDFField(hidden_size=128, n_layers=n_layers,
                         num_frequencies=0, skip_in=skip)
        params = field.init(jax.random.key(0))
        ref = lambda x: field.sdf(params, x)
        sdf, sdf_grad = make_fused_igr_sdf(field, params, interpret=True,
                                           precision="highest")
        x = jax.random.normal(jax.random.key(1), (500, 3)) * 0.5
        np.testing.assert_allclose(np.asarray(sdf(x)), np.asarray(ref(x)),
                                   atol=1e-6)
        v_ref, g_ref = sdf_and_grad(ref, x)
        v, g = sdf_grad(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)

    def test_geometric_init_sphere(self):
        """Fused eval of the geometric init must look like a sphere."""
        field = SDFField(hidden_size=128, n_layers=4, num_frequencies=0)
        params = field.init(jax.random.key(0))
        sdf, _ = make_fused_igr_sdf(field, params, interpret=True)
        ts = jnp.linspace(0.1, 0.9, 50)
        v = np.asarray(sdf(jnp.stack([ts, jnp.zeros_like(ts),
                                      jnp.zeros_like(ts)], -1)))
        assert v[0] < 0 < v[-1]  # inside negative, outside positive

    def test_requires_no_posenc(self):
        field = SDFField(hidden_size=64, n_layers=2, num_frequencies=6)
        params = field.init(jax.random.key(0))
        with pytest.raises(AssertionError):
            make_fused_igr_sdf(field, params, interpret=True)


class TestFusedModelPath:
    def test_fused_forward_matches_plain(self):
        """Implicit forward with use_fused_mlp must match the plain path
        (interpret-mode kernels on CPU)."""
        from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
        from isopoints_tpu.models.implicit import ImplicitConfig, ImplicitModel
        from isopoints_tpu.ops.images import arange_pixels

        field = SirenField(hidden_size=64, n_layers=2)
        m_plain = ImplicitModel(field, cfg=ImplicitConfig(proj_max_iters=10))
        m_fused = ImplicitModel(field, cfg=ImplicitConfig(proj_max_iters=10,
                                                          use_fused_mlp=True))
        params = m_plain.init(jax.random.key(0))
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        cam = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        mask = jnp.ones((1, 16, 16, 1))
        _, ndc = arange_pixels((8, 8), 1)
        out_p = m_plain.forward(params, ndc, img, mask, cam, jax.random.key(1))
        out_f = m_fused.forward(params, ndc, img, mask, cam, jax.random.key(1))
        np.testing.assert_allclose(np.asarray(out_p.iso_points),
                                   np.asarray(out_f.iso_points), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(out_p.network_mask),
                                      np.asarray(out_f.network_mask))

    def test_fused_grad_to_params_still_flows(self):
        """θ-gradients must flow via the plain-field loss evals even
        when tracing uses the fused kernel."""
        from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
        from isopoints_tpu.models.implicit import ImplicitConfig, ImplicitModel
        from isopoints_tpu.ops.images import arange_pixels

        field = SirenField(hidden_size=32, n_layers=1)
        model = ImplicitModel(field, cfg=ImplicitConfig(proj_max_iters=5,
                                                        use_fused_mlp=True))
        params = model.init(jax.random.key(0))
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        cam = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        mask = jnp.ones((1, 16, 16, 1))
        _, ndc = arange_pixels((8, 8), 1)

        def loss(params):
            out = model.forward(params, ndc, img, mask, cam, jax.random.key(1))
            return (jnp.sum(jnp.abs(out.sdf_freespace))
                    + jnp.sum(out.iso_points ** 2))

        g = jax.grad(loss)(params)
        assert any(bool(jnp.any(l != 0)) for l in jax.tree.leaves(g))


class TestPrecisionModes:
    """Accuracy contract of the three kernel precision modes
    (pallas_mlp.py module docstring): f32x3 values must land well under
    the 5e-5 projection/tracing tolerance; bf16 values plateau ~1e-3."""

    @pytest.mark.parametrize("maker,field", [
        (make_fused_igr_sdf,
         SDFField(hidden_size=128, n_layers=4, num_frequencies=0)),
        (make_fused_siren_sdf, SirenField(hidden_size=128, n_layers=2)),
    ])
    def test_f32x3_value_error_bound(self, maker, field):
        params = field.init(jax.random.key(0))
        ref = lambda x: field.sdf(params, x)
        x = jax.random.normal(jax.random.key(1), (1024, 3)) * 0.5
        v_ref, g_ref = sdf_and_grad(ref, x)
        _, sag = maker(field, params, interpret=True, precision="f32x3")
        v, g = sag(x)
        assert float(jnp.max(jnp.abs(v - v_ref))) < 2e-5
        # tangents are 1-pass bf16 by design: direction-accurate only
        assert float(jnp.max(jnp.abs(g - g_ref))) < 5e-2

    def test_f32x3_newton_converges_at_training_tolerance(self):
        """The regime VERDICT r1 flagged: Newton projection at the
        training tolerance must actually converge under the production
        kernel precision (f32x3)."""
        from isopoints_tpu.models.levelset import project_points_newton

        field = SDFField(hidden_size=128, n_layers=4, num_frequencies=0)
        params = field.init(jax.random.key(0))
        sdf, _ = make_fused_igr_sdf(field, params, interpret=True,
                                    precision="f32x3")
        pts = jax.random.uniform(jax.random.key(2), (1, 512, 3),
                                 minval=-0.8, maxval=0.8)
        res = project_points_newton(sdf, pts, jnp.ones((1, 512), bool),
                                    max_iters=10, tolerance=5e-5)
        assert float(res.mask.mean()) > 0.95

    def test_bf16_mode_runs(self):
        field = SDFField(hidden_size=128, n_layers=4, num_frequencies=0)
        params = field.init(jax.random.key(0))
        ref = lambda x: field.sdf(params, x)
        sdf, _ = make_fused_igr_sdf(field, params, interpret=True,
                                    precision="bf16")
        x = jax.random.normal(jax.random.key(1), (512, 3)) * 0.5
        assert float(jnp.max(jnp.abs(sdf(x) - ref(x)))) < 2e-2
