"""Field network unit tests: shapes, inits, gradients.

Oracle strategy (SURVEY.md §4): numeric invariants the reference
establishes behaviorally — geometric init ≈ sphere SDF; autograd
gradient matches central differences (common.py:492 parity)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.models.fields import (
    SirenField, SDFField, RenderingNetwork, OccupancyField,
    positional_embedder, sdf_and_grad, field_grad, approximate_gradient,
)


def test_positional_embedder_dims():
    embed, dim = positional_embedder(6, 3)
    assert dim == 3 + 3 * 2 * 6
    x = jnp.ones((5, 3))
    assert embed(x).shape == (5, dim)
    # first 3 dims are the input itself
    np.testing.assert_allclose(embed(x)[:, :3], x)


def test_siren_shapes_and_range():
    f = SirenField(dim=3, hidden_size=64, n_layers=2)
    params = f.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (100, 3))
    out = f.apply(params, x)
    assert out.sdf.shape == (100, 1)
    assert out.rgb is None


def test_sdf_geometric_init_is_sphere():
    """IGR geometric init ≈ SDF of a 0.6-sphere (common.py:258-275)."""
    f = SDFField(hidden_size=256, n_layers=8, bias=0.6, num_frequencies=6)
    params = f.init(jax.random.key(0))
    # At origin, sdf < 0 (inside); far out, sdf > 0
    v0 = f.sdf(params, jnp.zeros((1, 3)))
    v1 = f.sdf(params, jnp.asarray([[0.9, 0.0, 0.0]]))
    assert float(v0[0]) < 0.0
    assert float(v1[0]) > 0.0
    # Approximate radial symmetry: sdf at radius 0.6 near zero
    dirs = jax.random.normal(jax.random.key(2), (64, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    vals = f.sdf(params, dirs * 0.6)
    assert float(jnp.abs(vals).max()) < 0.15


def test_sdf_and_grad_matches_fd():
    f = SirenField(dim=3, hidden_size=64, n_layers=2)
    params = f.init(jax.random.key(0))
    apply_sdf = lambda x: f.sdf(params, x)
    x = jax.random.normal(jax.random.key(1), (20, 3)) * 0.5
    sdf, grad = sdf_and_grad(apply_sdf, x)
    assert sdf.shape == (20,)
    assert grad.shape == (20, 3)
    fd = approximate_gradient(apply_sdf, x, h=1e-3)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(fd), atol=2e-2, rtol=1e-2)
    g2 = field_grad(apply_sdf)(x)
    np.testing.assert_allclose(np.asarray(grad), np.asarray(g2), atol=1e-6)


def test_sdf_weight_norm_apply_finite():
    f = SDFField(hidden_size=64, n_layers=4, skip_in=(2,), num_frequencies=4)
    params = f.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (17, 3)) * 0.3
    out = f.apply(params, x)
    assert bool(jnp.isfinite(out.sdf).all())


def test_rendering_network_range():
    rn = RenderingNetwork(dim=9, c_dim=8, hidden_size=64, n_layers=2)
    params = rn.init(jax.random.key(0))
    nrm = jax.random.normal(jax.random.key(1), (11, 3))
    pts = jax.random.normal(jax.random.key(3), (11, 3))
    view = jax.random.normal(jax.random.key(4), (11, 3))
    c = jax.random.normal(jax.random.key(2), (11, 8))
    out = rn.apply_with_view(params, nrm, pts, view, c)
    assert out.rgb.shape == (11, 3)
    assert float(out.rgb.min()) >= 0.0 and float(out.rgb.max()) <= 1.0


def test_occupancy_field():
    f = OccupancyField(hidden_size=32, n_blocks=2)
    params = f.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (7, 3))
    out = f.apply(params, x)
    # occupancy is returned as logits (DVR convention)
    assert out.occupancy.shape == (7, 1)
    assert bool(jnp.isfinite(out.occupancy).all())


def test_siren_jit_and_grad_wrt_params():
    f = SirenField(dim=3, hidden_size=32, n_layers=1)
    params = f.init(jax.random.key(0))
    x = jax.random.normal(jax.random.key(1), (10, 3))

    @jax.jit
    def loss(p):
        return jnp.mean(f.apply(p, x).sdf ** 2)

    g = jax.grad(loss)(params)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    assert any(float(jnp.abs(l).max()) > 0 for l in leaves)
