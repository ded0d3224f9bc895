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
        self.sdf, self.sdf_grad = make_fused_siren_sdf(
            self.field, self.params, interpret=True)

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
        sdf, sdf_grad = make_fused_igr_sdf(field, params, interpret=True)
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
