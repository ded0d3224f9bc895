"""Level-set engine tests against analytic SDFs.

Oracles (SURVEY.md §4 implications): projection converges to |f|<τ on
analytic fields; the sample-network parameter-gradient equals the
implicit-function-theorem value −∇f/|∇f|²·∂f/∂θ."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.models.levelset import (
    ProjectionConfig, project_points_newton, resample_repulsion,
    project_points, sample_network, directional_sample_network,
    sample_uniform_iso_points, edge_aware_upsample,
)
from isopoints_tpu.ops.neighbors import knn_points
from isopoints_tpu.utils import num_valid


def sphere_sdf(r=0.6):
    return lambda x: jnp.linalg.norm(x, axis=-1) - r


def test_newton_projection_sphere():
    key = jax.random.key(0)
    pts = jax.random.uniform(key, (1, 512, 3), minval=-1, maxval=1)
    res = project_points_newton(sphere_sdf(), pts, jnp.ones((1, 512), bool),
                                max_iters=20, tolerance=1e-5)
    assert float(res.mask.mean()) > 0.99
    r = np.linalg.norm(np.asarray(res.points), axis=-1)[np.asarray(res.mask)]
    np.testing.assert_allclose(r, 0.6, atol=1e-4)
    # normals = gradient = radial direction
    n = np.asarray(res.normals)[np.asarray(res.mask)]
    p = np.asarray(res.points)[np.asarray(res.mask)]
    cos = np.sum(n * p, -1) / (np.linalg.norm(n, axis=-1) * np.linalg.norm(p, axis=-1))
    np.testing.assert_allclose(cos, 1.0, atol=1e-4)


def test_newton_projection_respects_mask():
    pts = jnp.ones((1, 4, 3))
    mask = jnp.asarray([[True, True, False, False]])
    res = project_points_newton(sphere_sdf(), pts, mask, max_iters=20)
    # masked-out points unchanged
    np.testing.assert_allclose(np.asarray(res.points)[0, 2:], 1.0)
    assert not bool(res.mask[0, 2:].any())


def test_newton_projection_hybrid_precision():
    """Coarse/fine schedule (VERDICT r4 item 4): a noisy coarse fn
    carries the bulk of the iterations; the fine finish converges to
    the fine tolerance, and coarse == fine reproduces the plain path
    exactly."""
    key = jax.random.key(2)
    pts = jax.random.uniform(key, (1, 512, 3), minval=-0.9, maxval=0.9)
    mask = jnp.ones((1, 512), bool)
    fine = sphere_sdf()

    # identity case: coarse == fine must match the plain path exactly
    plain = project_points_newton(fine, pts, mask, max_iters=12,
                                  tolerance=5e-5)
    hybrid_id = project_points_newton(fine, pts, mask, max_iters=12,
                                      tolerance=5e-5, sdf_fn_coarse=fine,
                                      coarse_iters=8,
                                      coarse_tolerance=5e-5)
    np.testing.assert_array_equal(np.asarray(plain.mask),
                                  np.asarray(hybrid_id.mask))
    np.testing.assert_allclose(np.asarray(plain.points),
                               np.asarray(hybrid_id.points), atol=1e-6)

    # bf16-like coarse fn (values rounded to bf16): the fine finish
    # must still reach the 5e-5 contract the coarse fn cannot
    coarse = lambda x: fine(x).astype(jnp.bfloat16).astype(jnp.float32)
    hyb = project_points_newton(fine, pts, mask, max_iters=4,
                                tolerance=5e-5, sdf_fn_coarse=coarse,
                                coarse_iters=10, coarse_tolerance=1e-3)
    assert float(hyb.mask.mean()) > 0.99
    r = np.linalg.norm(np.asarray(hyb.points), axis=-1)[np.asarray(hyb.mask)]
    np.testing.assert_allclose(r, 0.6, atol=1e-4)


def test_resampling_uniformizes_on_sphere():
    key = jax.random.key(1)
    # noisy sphere samples (realistic iso-point state after projection)
    pts = jax.random.normal(key, (1, 400, 3))
    pts = pts / jnp.linalg.norm(pts, axis=-1, keepdims=True) * 0.6
    pts = pts + jax.random.normal(jax.random.key(9), (1, 400, 3)) * 0.05
    proj = project_points_newton(sphere_sdf(), pts, jnp.ones((1, 400), bool),
                                 max_iters=20)
    cfg = ProjectionConfig(sample_iters=5, knn_k=8)
    res = resample_repulsion(sphere_sdf(), proj.points, proj.normals, proj.mask, cfg)
    # still on the sphere
    r = np.linalg.norm(np.asarray(res.points), axis=-1)[np.asarray(res.mask)]
    np.testing.assert_allclose(r, 0.6, atol=1e-3)

    def cv(points, mask):
        r = knn_points(points, points, mask, mask, k=1, exclude_self=True)
        d = np.sqrt(np.asarray(r.dists[..., 0])[np.asarray(r.mask[..., 0])])
        return d.std() / d.mean()

    assert cv(res.points, res.mask) < cv(proj.points, proj.mask)


def test_sample_network_gradient():
    """Value == p0; dL/dθ matches implicit-function theorem for a
    parameterized sphere f(x; r) = |x| − r: dp/dr = +x/|x| (projection
    moves out as r grows), so dL/dr = Σ ∂L/∂p · x̂."""
    p0 = jnp.asarray([[0.6, 0.0, 0.0], [0.0, 0.6, 0.0], [0.0, 0.0, -0.6]])

    def loss(r):
        sdf = lambda x: jnp.linalg.norm(x, axis=-1) - r
        p = sample_network(sdf, p0)
        return jnp.sum(p[:, 0])  # dL/dp = e_x per point

    val = loss(0.6)
    np.testing.assert_allclose(float(val), 0.6, atol=1e-6)  # value preserved
    g = jax.grad(loss)(0.6)
    # analytic: sum over points of <e_x, x/|x|> = 1 + 0 + 0
    np.testing.assert_allclose(float(g), 1.0, atol=1e-4)


def test_directional_sample_network_gradient():
    """Along ray e_x from origin through (0.6,0,0): t(r) = r ->
    d(p_x)/dr = 1."""
    cam = jnp.zeros((1, 3))
    p0 = jnp.asarray([[0.6, 0.0, 0.0]])
    ray = jnp.asarray([[1.0, 0.0, 0.0]])

    def loss(r):
        sdf = lambda x: jnp.linalg.norm(x, axis=-1) - r
        p = directional_sample_network(sdf, p0, ray, cam)
        return jnp.sum(p[:, 0])

    np.testing.assert_allclose(float(loss(0.6)), 0.6, atol=1e-6)
    g = jax.grad(loss)(0.6)
    np.testing.assert_allclose(float(g), 1.0, atol=1e-4)


def test_project_points_full_pipeline():
    key = jax.random.key(2)
    pts = jax.random.uniform(key, (1, 256, 3), minval=-1, maxval=1)
    res = project_points(sphere_sdf(), pts, jnp.ones((1, 256), bool),
                         ProjectionConfig(sample_iters=2),
                         skip_resampling=False, skip_upsampling=False)
    assert res.points.shape == (1, 256, 3)
    r = np.linalg.norm(np.asarray(res.points), axis=-1)[np.asarray(res.mask)]
    np.testing.assert_allclose(r, 0.6, atol=1e-3)
    assert int(num_valid(res.mask)[0]) > 200


def test_sample_uniform_iso_points():
    res = sample_uniform_iso_points(sphere_sdf(0.5), 256, jax.random.key(3))
    assert res.points.shape == (1, 256, 3)
    frac = float(res.mask.mean())
    assert frac > 0.95
    r = np.linalg.norm(np.asarray(res.points), axis=-1)[np.asarray(res.mask)]
    np.testing.assert_allclose(r, 0.5, atol=1e-3)
    # roughly uniform: nn spacing CV below 0.5
    kr = knn_points(res.points, res.points, res.mask, res.mask, k=1, exclude_self=True)
    d = np.sqrt(np.asarray(kr.dists[..., 0])[np.asarray(kr.mask[..., 0])])
    assert d.std() / d.mean() < 0.5


def test_sample_uniform_iso_points_seeded():
    """Seeded resample (reference trainer.py:228 passes the persistent
    cloud as init_points): masked seeds near the surface must yield a
    full uniform set WITHOUT the 4x random-cube bootstrap — including
    masked-out garbage slots that must not leak through."""
    f = sphere_sdf(0.5)
    k = jax.random.key(5)
    # 128 noisy near-surface seeds in a 192-slot buffer; 64 garbage slots
    dirs = jax.random.normal(k, (1, 128, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    seeds = dirs * 0.55 + 0.02 * jax.random.normal(jax.random.key(6),
                                                   (1, 128, 3))
    buf = jnp.concatenate([seeds, jnp.full((1, 64, 3), 37.0)], axis=1)
    m = jnp.arange(192)[None, :] < 128
    res = sample_uniform_iso_points(f, 256, jax.random.key(7),
                                    init_points=buf, init_mask=m)
    assert res.points.shape == (1, 256, 3)
    assert float(res.mask.mean()) > 0.9
    r = np.linalg.norm(np.asarray(res.points), axis=-1)[np.asarray(res.mask)]
    np.testing.assert_allclose(r, 0.5, atol=1e-3)


def test_sample_uniform_iso_points_seeded_shrinking():
    """Shrinking seeded resample: seed buffer WIDER than the target
    (the ablation's 8k start cloud at the scheduler's first 6k-point
    resample — r5 crash: midpoint_upsample got an over-wide seed and
    died on a broadcast). Valid seeds must be randomly subsampled to
    the target, still uniform on the surface."""
    f = sphere_sdf(0.5)
    dirs = jax.random.normal(jax.random.key(8), (1, 300, 3))
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    seeds = dirs * 0.52
    m = jnp.arange(300)[None, :] < 280    # some masked garbage slots
    res = sample_uniform_iso_points(f, 192, jax.random.key(9),
                                    init_points=seeds, init_mask=m)
    assert res.points.shape == (1, 192, 3)
    assert float(res.mask.mean()) > 0.9
    r = np.linalg.norm(np.asarray(res.points), axis=-1)[np.asarray(res.mask)]
    np.testing.assert_allclose(r, 0.5, atol=1e-3)


def test_edge_aware_upsample_box():
    """EAR upsampling on a cube SDF keeps points on the surface and
    reaches the target count."""
    def cube_sdf(x):
        # smoothed box SDF (plain norm(relu(q)) has NaN grad on faces)
        q = jnp.abs(x) - 0.5
        out = jnp.sqrt(jnp.sum(jnp.maximum(q, 0.0) ** 2, axis=-1) + 1e-12)
        return out + jnp.minimum(jnp.max(q, axis=-1), 0.0)

    pts = jax.random.uniform(jax.random.key(4), (1, 128, 3), minval=-0.8, maxval=0.8)
    proj = project_points_newton(cube_sdf, pts, jnp.ones((1, 128), bool), max_iters=20)
    up, upm = edge_aware_upsample(cube_sdf, proj.points, proj.mask, 256,
                                  ProjectionConfig(knn_k=12))
    assert int(num_valid(upm)[0]) >= int(num_valid(proj.mask)[0])
    assert bool(jnp.isfinite(up).all())
