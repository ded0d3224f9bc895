"""Ray engine tests: intersections, sphere tracing, IDR tracer, DVR secant.

Oracle: analytic sphere/torus SDFs — every traced point must satisfy
|f(p)| < tol and lie on its ray (the reference offers only behavioral
oracles, SURVEY.md §4).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.models.raytracing import (
    RayTracingConfig,
    find_zero_crossing_between_point_pairs,
    intersection_with_unit_cube,
    intersection_with_unit_sphere,
    ray_trace,
    sphere_trace_along_rays,
)


def sphere_sdf(r=0.5):
    return lambda x: jnp.linalg.norm(x, axis=-1) - r


def torus_sdf(R=0.5, r=0.2):
    def f(x):
        q = jnp.stack([jnp.linalg.norm(x[..., :2], axis=-1) - R, x[..., 2]], -1)
        return jnp.linalg.norm(q, axis=-1) - r
    return f


class TestCubeIntersection:
    def test_center_ray_hits(self):
        o = jnp.array([[[0.0, 0.0, -3.0]]])
        d = jnp.array([[[0.0, 0.0, 1.0]]])
        ent, ext, hit = intersection_with_unit_cube(o, d, side_length=1.0, padding=0.0)
        assert bool(hit[0, 0])
        np.testing.assert_allclose(ent[0, 0], [0, 0, -0.5], atol=1e-5)
        np.testing.assert_allclose(ext[0, 0], [0, 0, 0.5], atol=1e-5)

    def test_miss(self):
        o = jnp.array([[[0.0, 2.0, -3.0]]])
        d = jnp.array([[[0.0, 0.0, 1.0]]])
        _, _, hit = intersection_with_unit_cube(o, d, side_length=1.0, padding=0.0)
        assert not bool(hit[0, 0])

    def test_entry_before_exit(self):
        key = jax.random.key(0)
        o = jax.random.normal(key, (2, 64, 3)) * 0.2 + jnp.array([0, 0, -2.0])
        d = jnp.array([0.0, 0.0, 1.0]) + 0.3 * jax.random.normal(
            jax.random.key(1), (2, 64, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        ent, ext, hit = intersection_with_unit_cube(o, d)
        t_ent = jnp.sum((ent - o) * d, axis=-1)
        t_ext = jnp.sum((ext - o) * d, axis=-1)
        assert bool(jnp.all(jnp.where(hit, t_ext >= t_ent, True)))


class TestSphereIntersection:
    def test_hit_points_on_sphere(self):
        o = jnp.array([[[0.0, 0.0, -3.0]]])
        d = jnp.array([[[0.0, 0.0, 1.0]]])
        near, far, hit = intersection_with_unit_sphere(o, d, radius=1.0)
        assert bool(hit[0, 0])
        np.testing.assert_allclose(jnp.linalg.norm(near), 1.0, atol=1e-5)
        np.testing.assert_allclose(jnp.linalg.norm(far), 1.0, atol=1e-5)
        np.testing.assert_allclose(near[0, 0], [0, 0, -1.0], atol=1e-5)

    def test_miss_tangent_plane_fallback(self):
        o = jnp.array([[[0.0, 0.0, -3.0]]])
        d = jnp.array([[[0.0, 1.0, 0.2]]])
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        near, far, hit = intersection_with_unit_sphere(o, d, radius=1.0)
        assert not bool(hit[0, 0])
        # fallback still produces a forward interval
        assert bool(jnp.all(jnp.isfinite(near))) and bool(jnp.all(jnp.isfinite(far)))


class TestSphereTracing:
    def test_converges_on_sphere(self):
        f = sphere_sdf(0.5)
        o = jnp.array([[[0.0, 0.0, -0.95], [0.0, -0.95, 0.0], [-0.9, 0.0, 0.0]]])
        d = -o / jnp.linalg.norm(o, axis=-1, keepdims=True)
        res = sphere_trace_along_rays(f, o, d, max_iters=30, tolerance=1e-5)
        assert bool(jnp.all(res.mask))
        np.testing.assert_allclose(np.abs(np.asarray(f(res.points))), 0.0, atol=1e-5)
        # grad cache is the initial gradient (unit radial here)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(res.grad), axis=-1), 1.0, atol=1e-4)

    def test_escaping_ray_not_converged(self):
        f = sphere_sdf(0.5)
        o = jnp.array([[[0.0, 0.9, 0.0]]])
        d = jnp.array([[[0.0, 1.0, 0.0]]])  # pointing away
        res = sphere_trace_along_rays(f, o, d, max_iters=20, tolerance=1e-5)
        assert not bool(res.mask[0, 0])


class TestIDRRayTrace:
    def _rays(self, b=1, n=128, key=0):
        cam = jnp.array([0.0, 0.0, -2.5])
        k = jax.random.key(key)
        ang = jax.random.uniform(k, (b, n, 2), minval=-0.35, maxval=0.35)
        d = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                       jnp.ones((b, n))], axis=-1)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return jnp.broadcast_to(cam, d.shape), d

    def test_hits_sphere_surface(self):
        f = sphere_sdf(0.5)
        cam, dirs = self._rays()
        gt_mask = jnp.ones(dirs.shape[:-1], dtype=bool)
        res = ray_trace(f, cam, dirs, gt_mask, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=30), training=False)
        hits = np.asarray(res.network_object_mask)
        assert hits.sum() > 0
        sdf_at = np.asarray(f(res.points))
        assert np.abs(sdf_at[hits]).max() < 1e-3
        # analytic depth check: t = |c| - sqrt(r² - b²) along center rays
        center_ray = np.argmax(np.asarray(dirs[..., 2]))
        assert abs(np.asarray(res.dists).ravel()[center_ray] - 2.0) < 1e-2

    def test_torus_with_secant_fallback(self):
        f = torus_sdf()
        cam, dirs = self._rays(n=256, key=3)
        gt_mask = jnp.ones(dirs.shape[:-1], dtype=bool)
        res = ray_trace(f, cam, dirs, gt_mask, jax.random.key(2),
                        RayTracingConfig(sphere_tracing_iters=10), training=True)
        hits = np.asarray(res.network_object_mask)
        assert hits.sum() > 0
        sdf_at = np.asarray(f(res.points))
        assert np.abs(sdf_at[hits]).max() < 5e-3

    def test_training_fallback_points_on_rays(self):
        f = sphere_sdf(0.3)
        cam, dirs = self._rays(n=64, key=5)
        gt_mask = jnp.zeros(dirs.shape[:-1], dtype=bool)  # all "out" pixels
        res = ray_trace(f, cam, dirs, gt_mask, jax.random.key(4), training=True)
        # every point must lie on its ray
        t = jnp.sum((res.points - cam) * dirs, axis=-1)
        recon = cam + t[..., None] * dirs
        np.testing.assert_allclose(np.asarray(recon), np.asarray(res.points), atol=1e-4)


class TestZeroCrossing:
    def test_sdf_crossing(self):
        f = sphere_sdf(0.5)
        p0 = jnp.array([[[0.0, 0.0, -1.0], [0.0, -1.0, 0.0]]])
        p1 = jnp.array([[[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]]])
        pts, mask = find_zero_crossing_between_point_pairs(f, p0, p1)
        assert bool(jnp.all(mask))
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pts), axis=-1), 0.5, atol=1e-4)

    def test_no_crossing(self):
        f = sphere_sdf(0.5)
        p0 = jnp.array([[[0.0, 0.0, -2.0]]])
        p1 = jnp.array([[[0.0, 0.0, -1.0]]])
        _, mask = find_zero_crossing_between_point_pairs(f, p0, p1)
        assert not bool(mask[0, 0])

    def test_in_to_out_rejected(self):
        f = sphere_sdf(0.5)
        p0 = jnp.array([[[0.0, 0.0, 0.0]]])   # inside
        p1 = jnp.array([[[0.0, 0.0, 2.0]]])   # outside
        _, mask = find_zero_crossing_between_point_pairs(f, p0, p1)
        assert not bool(mask[0, 0])
        _, mask2 = find_zero_crossing_between_point_pairs(
            f, p0, p1, allow_in_to_out=True)
        assert bool(mask2[0, 0])

    def test_occupancy_convention(self):
        # occupancy: inside = high; f = -(sdf) sign flip via sigmoid-free proxy
        f = lambda x: -(jnp.linalg.norm(x, axis=-1) - 0.5)
        p0 = jnp.array([[[0.0, 0.0, -1.0]]])
        p1 = jnp.array([[[0.0, 0.0, 0.0]]])
        pts, mask = find_zero_crossing_between_point_pairs(
            f, p0, p1, is_occupancy=True)
        assert bool(mask[0, 0])
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(pts), axis=-1), 0.5, atol=1e-4)


class TestSamplerCompaction:
    def test_fraction_matches_full_when_capacity_suffices(self):
        """sampler_fraction < 1 must agree with the full-width sampler
        as long as the unconverged count fits the static capacity."""
        f = torus_sdf()
        cam = jnp.broadcast_to(jnp.array([0.0, 0.0, -2.5]), (1, 128, 3))
        k = jax.random.key(7)
        ang = jax.random.uniform(k, (1, 128, 2), minval=-0.3, maxval=0.3)
        d = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                       jnp.ones((1, 128))], axis=-1)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        gt = jnp.ones((1, 128), bool)
        # few tracing iters -> many rays go to the sampler
        full = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=3),
                         training=False)
        frac = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=3,
                                          sampler_fraction=0.99),
                         training=False)
        np.testing.assert_array_equal(np.asarray(full.network_object_mask),
                                      np.asarray(frac.network_object_mask))
        np.testing.assert_allclose(np.asarray(full.dists),
                                   np.asarray(frac.dists), atol=1e-5)

    def test_chunked_sampler_matches_full(self):
        f = sphere_sdf()
        cam = jnp.broadcast_to(jnp.array([0.0, 0.0, -2.5]), (1, 64, 3))
        k = jax.random.key(8)
        ang = jax.random.uniform(k, (1, 64, 2), minval=-0.3, maxval=0.3)
        d = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                       jnp.ones((1, 64))], axis=-1)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        gt = jnp.ones((1, 64), bool)
        full = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=3),
                         training=False)
        chunked = ray_trace(f, cam, d, gt, jax.random.key(1),
                            RayTracingConfig(sphere_tracing_iters=3,
                                             sampler_chunk_rays=16),
                            training=False)
        np.testing.assert_allclose(np.asarray(full.dists),
                                   np.asarray(chunked.dists), atol=1e-5)


class TestTraceCompaction:
    def test_two_phase_matches_full_when_capacity_suffices(self):
        f = torus_sdf()
        cam = jnp.broadcast_to(jnp.array([0.0, 0.0, -2.5]), (1, 128, 3))
        k = jax.random.key(9)
        ang = jax.random.uniform(k, (1, 128, 2), minval=-0.3, maxval=0.3)
        d = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                       jnp.ones((1, 128))], axis=-1)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        gt = jnp.ones((1, 128), bool)
        full = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=20),
                         training=False)
        two = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=20,
                                         trace_compact_after=4,
                                         trace_compact_fraction=0.99),
                        training=False)
        np.testing.assert_array_equal(np.asarray(full.network_object_mask),
                                      np.asarray(two.network_object_mask))
        np.testing.assert_allclose(np.asarray(full.dists),
                                   np.asarray(two.dists), atol=1e-5)

    def test_small_capacity_still_valid(self):
        """Overflowing rays keep phase-1 state; traced hits must still
        satisfy |f| small."""
        f = sphere_sdf()
        cam = jnp.broadcast_to(jnp.array([0.0, 0.0, -2.5]), (1, 128, 3))
        k = jax.random.key(10)
        ang = jax.random.uniform(k, (1, 128, 2), minval=-0.3, maxval=0.3)
        d = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                       jnp.ones((1, 128))], axis=-1)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        gt = jnp.ones((1, 128), bool)
        res = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=30,
                                         trace_compact_after=3,
                                         trace_compact_fraction=0.1),
                        training=False)
        hits = np.asarray(res.network_object_mask)
        assert hits.sum() > 0
        assert np.abs(np.asarray(f(res.points))[hits]).max() < 1e-3


def _ray_fan(n=128, seed=9, z=-2.5):
    cam = jnp.broadcast_to(jnp.array([0.0, 0.0, z]), (1, n, 3))
    ang = jax.random.uniform(jax.random.key(seed), (1, n, 2),
                             minval=-0.3, maxval=0.3)
    d = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                   jnp.ones((1, n))], axis=-1)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    return cam, d, jnp.ones((1, n), bool)


class TestCoarseFineTrace:
    def test_coarse_equals_fine_is_identity(self):
        """With sdf_fn_coarse == sdf_fn, the coarse/fine schedule is
        exactly the plain trace (the boundary re-validation recomputes
        the same stationary front states)."""
        f = torus_sdf()
        cam, d, gt = _ray_fan()
        full = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=20),
                         training=False)
        sched = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=20,
                                           coarse_trace_iters=8,
                                           sampler_coarse=True),
                          training=False, sdf_fn_coarse=f)
        np.testing.assert_array_equal(
            np.asarray(full.network_object_mask),
            np.asarray(sched.network_object_mask))
        np.testing.assert_array_equal(np.asarray(full.dists),
                                      np.asarray(sched.dists))

    def test_noisy_coarse_still_converges_fine(self):
        """A bf16-like noisy coarse fn (~1e-3 value error) must not
        degrade the result: converged rays satisfy |f_fine| small and
        the hit mask matches the pure-fine trace."""
        f = sphere_sdf()

        def f_noisy(x):
            v = f(x)
            # deterministic pseudo-noise at bf16-accumulation scale
            n = 1e-3 * jnp.sin(1e3 * jnp.sum(x, axis=-1))
            return v + n

        cam, d, gt = _ray_fan(seed=11)
        pure = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=24),
                         training=False)
        sched = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=24,
                                           coarse_trace_iters=10,
                                           sampler_coarse=True),
                          training=False, sdf_fn_coarse=f_noisy)
        hits = np.asarray(sched.network_object_mask)
        assert hits.sum() > 0
        # every claimed hit lies on the true surface
        assert np.abs(np.asarray(f(sched.points))[hits]).max() < 1e-3
        agree = (hits == np.asarray(pure.network_object_mask)).mean()
        assert agree > 0.98
        both = hits & np.asarray(pure.network_object_mask)
        np.testing.assert_allclose(np.asarray(sched.dists)[both],
                                   np.asarray(pure.dists)[both], atol=5e-3)

    def test_coarse_with_compaction(self):
        """Schedule composes with two-phase straggler compaction."""
        f = sphere_sdf()
        cam, d, gt = _ray_fan(seed=12)
        full = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=20),
                         training=False)
        sched = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=20,
                                           coarse_trace_iters=6,
                                           trace_compact_after=8,
                                           trace_compact_fraction=0.99),
                          training=False, sdf_fn_coarse=f)
        np.testing.assert_array_equal(
            np.asarray(full.network_object_mask),
            np.asarray(sched.network_object_mask))
        np.testing.assert_allclose(np.asarray(full.dists),
                                   np.asarray(sched.dists), atol=1e-5)


class TestOverflowCounters:
    """Compaction-overflow observability (RayTraceResult counters)."""

    def _rays(self, n=128, seed=11):
        cam = jnp.broadcast_to(jnp.array([0.0, 0.0, -2.5]), (1, n, 3))
        ang = jax.random.uniform(jax.random.key(seed), (1, n, 2),
                                 minval=-0.3, maxval=0.3)
        d = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                       jnp.ones((1, n))], axis=-1)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        return cam, d, jnp.ones((1, n), bool)

    def test_zero_when_capacity_suffices(self):
        cam, d, gt = self._rays()
        res = ray_trace(sphere_sdf(), cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=20,
                                         trace_compact_after=4,
                                         trace_compact_fraction=0.99,
                                         sampler_fraction=0.99),
                        training=False)
        assert int(res.trace_overflow) == 0
        assert int(res.sampler_overflow) == 0

    def test_trace_overflow_counted(self):
        cam, d, gt = self._rays()
        # after 3 iters most torus rays are still active; cap 4 rays
        res = ray_trace(torus_sdf(), cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=30,
                                         trace_compact_after=3,
                                         trace_compact_fraction=4 / 128),
                        training=False)
        assert int(res.trace_overflow) > 0

    def test_sampler_overflow_counted(self):
        cam, d, gt = self._rays()
        # 3 tracing iters leave most rays unconverged; sampler cap 2
        res = ray_trace(torus_sdf(), cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=3,
                                         sampler_fraction=2 / 128),
                        training=False)
        assert int(res.sampler_overflow) > 0
        # overflowed rays are reported non-surface, not garbage
        hits = np.asarray(res.network_object_mask)
        f = torus_sdf()
        if hits.sum():
            assert np.abs(np.asarray(f(res.points))[hits]).max() < 5e-2


class TestFusedBackstep:
    """RayTracingConfig.fused_backstep: one eval per iteration; the
    backstep consumes an iteration slot instead of a second full-width
    eval. Same trajectory rule — at a matched eval budget the fused
    loop must converge at least as many rays, and agreeing hits must
    land on the same surface points."""

    def test_matches_reference_path_on_sphere(self):
        f = sphere_sdf()
        cam, d, gt = _ray_fan(seed=21)
        ref = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=20),
                        training=False)
        # 20 reference iterations cost <=40 evals; give the fused loop
        # the same eval budget
        fused = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=40,
                                           fused_backstep=True),
                          training=False)
        hits_r = np.asarray(ref.network_object_mask)
        hits_f = np.asarray(fused.network_object_mask)
        assert hits_f.sum() >= hits_r.sum()
        both = hits_r & hits_f
        np.testing.assert_allclose(np.asarray(fused.dists)[both],
                                   np.asarray(ref.dists)[both], atol=1e-3)
        # every claimed hit lies on the surface
        assert np.abs(np.asarray(f(fused.points))[hits_f]).max() < 1e-3

    def test_torus_hits_on_surface(self):
        f = torus_sdf()
        cam, d, gt = _ray_fan(seed=22)
        fused = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=24,
                                           fused_backstep=True),
                          training=True)
        hits = np.asarray(fused.network_object_mask)
        assert hits.sum() > 0
        assert np.abs(np.asarray(f(fused.points))[hits]).max() < 1e-3
        # fallback points stay on their rays (training path intact)
        t = np.asarray(fused.dists)
        pts = np.asarray(fused.points)
        cam_np, d_np = np.asarray(cam), np.asarray(d)
        np.testing.assert_allclose(pts, cam_np + t[..., None] * d_np,
                                   atol=1e-5)

    def test_composes_with_schedule_and_compaction(self):
        f = sphere_sdf()
        cam, d, gt = _ray_fan(seed=23)
        res = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=24,
                                         fused_backstep=True,
                                         coarse_trace_iters=8,
                                         trace_compact_after=12,
                                         trace_compact_fraction=0.99,
                                         trace_compact_coarse=True,
                                         sampler_coarse=True),
                        training=False, sdf_fn_coarse=f)
        hits = np.asarray(res.network_object_mask)
        assert hits.sum() > 0
        assert np.abs(np.asarray(f(res.points))[hits]).max() < 1e-3


class TestCompactCoarse:
    def test_identity_when_coarse_equals_fine(self):
        """trace_compact_coarse with coarse == fine must be exactly the
        plain two-phase trace (the re-validation recomputes the
        compacted loop's own exit values)."""
        f = torus_sdf()
        cam, d, gt = _ray_fan(seed=24)
        plain = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=20,
                                           trace_compact_after=4,
                                           trace_compact_fraction=0.99),
                          training=False)
        cc = ray_trace(f, cam, d, gt, jax.random.key(1),
                       RayTracingConfig(sphere_tracing_iters=20,
                                        trace_compact_after=4,
                                        trace_compact_fraction=0.99,
                                        trace_compact_coarse=True),
                       training=False, sdf_fn_coarse=f)
        np.testing.assert_array_equal(np.asarray(plain.network_object_mask),
                                      np.asarray(cc.network_object_mask))
        np.testing.assert_array_equal(np.asarray(plain.dists),
                                      np.asarray(cc.dists))

    def test_noisy_coarse_phase2_hits_stay_fine(self):
        """With a noisy coarse fn in phase 2, claimed hits still satisfy
        |f_fine| small (early-stopped fronts fall to the sampler)."""
        f = sphere_sdf()

        def f_noisy(x):
            return f(x) + 1e-3 * jnp.sin(1e3 * jnp.sum(x, axis=-1))

        cam, d, gt = _ray_fan(seed=25)
        res = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=24,
                                         coarse_trace_iters=8,
                                         trace_compact_after=12,
                                         trace_compact_fraction=0.99,
                                         trace_compact_coarse=True,
                                         sampler_coarse=True),
                        training=False, sdf_fn_coarse=f_noisy)
        hits = np.asarray(res.network_object_mask)
        assert hits.sum() > 0
        assert np.abs(np.asarray(f(res.points))[hits]).max() < 1e-3


class TestMultiStageCompaction:
    def test_chain_matches_full_when_capacity_suffices(self):
        """A (4, 8)-stage chain with ample capacities must agree with
        the uncompacted trace exactly."""
        f = torus_sdf()
        cam, d, gt = _ray_fan(seed=26)
        full = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=20),
                         training=False)
        chain = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=20,
                                           trace_compact_after=(4, 8),
                                           trace_compact_fraction=(0.99,
                                                                   0.99)),
                          training=False)
        np.testing.assert_array_equal(np.asarray(full.network_object_mask),
                                      np.asarray(chain.network_object_mask))
        np.testing.assert_allclose(np.asarray(full.dists),
                                   np.asarray(chain.dists), atol=1e-5)

    def test_chain_overflow_counted_and_valid(self):
        f = torus_sdf()
        cam, d, gt = _ray_fan(seed=27)
        res = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=30,
                                         trace_compact_after=(3, 6),
                                         trace_compact_fraction=(0.5,
                                                                 4 / 128)),
                        training=False)
        assert int(res.trace_overflow) > 0
        hits = np.asarray(res.network_object_mask)
        assert hits.sum() > 0
        assert np.abs(np.asarray(f(res.points))[hits]).max() < 1e-3

    def test_chain_with_coarse_schedule(self):
        """Chain composes with the precision schedule; coarse == fine
        is the identity up to last-bit re-evaluation noise (the
        per-stage revalidation recomputes f outside the loop, where XLA
        may fuse differently — a ray sitting exactly at the threshold
        can take one extra ~5e-5 step)."""
        f = sphere_sdf()
        cam, d, gt = _ray_fan(seed=28)
        full = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=20),
                         training=False)
        chain = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=20,
                                           coarse_trace_iters=6,
                                           trace_compact_after=(6, 10),
                                           trace_compact_fraction=(0.99,
                                                                   0.99),
                                           trace_compact_coarse=True,
                                           sampler_coarse=True),
                          training=False, sdf_fn_coarse=f)
        np.testing.assert_array_equal(np.asarray(full.network_object_mask),
                                      np.asarray(chain.network_object_mask))
        np.testing.assert_allclose(np.asarray(full.dists),
                                   np.asarray(chain.dists), atol=1e-4)


class TestSamplerPresweep:
    def test_matches_dense_on_sphere(self):
        """Presweep + certificate must reproduce the dense sampler's
        hits and depths on an exact SDF (Lipschitz 1 — the certificate
        is sound, and flagged rays run the identical dense sweep)."""
        f = sphere_sdf()
        cam, d, gt = _ray_fan(seed=31)
        dense = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=3),
                          training=False)
        pre = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=3,
                                         sampler_presweep=26,
                                         sampler_dense_fraction=0.99),
                        training=False)
        np.testing.assert_array_equal(np.asarray(dense.network_object_mask),
                                      np.asarray(pre.network_object_mask))
        both = np.asarray(dense.network_object_mask)
        np.testing.assert_allclose(np.asarray(pre.dists)[both],
                                   np.asarray(dense.dists)[both], atol=1e-5)
        assert int(pre.sampler_overflow) == 0

    def test_matches_dense_on_torus(self):
        """Torus: thin features — flagged rays must still find the same
        first crossing as the dense reference sweep."""
        f = torus_sdf()
        cam, d, gt = _ray_fan(seed=32)
        dense = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=3),
                          training=False)
        pre = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=3,
                                         sampler_presweep=26,
                                         sampler_dense_fraction=0.99),
                        training=False)
        np.testing.assert_array_equal(np.asarray(dense.network_object_mask),
                                      np.asarray(pre.network_object_mask))
        both = np.asarray(dense.network_object_mask)
        np.testing.assert_allclose(np.asarray(pre.dists)[both],
                                   np.asarray(dense.dists)[both], atol=1e-5)

    def test_dense_capacity_overflow_counted(self):
        f = torus_sdf()
        cam, d, gt = _ray_fan(seed=33)
        pre = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=3,
                                         sampler_presweep=26,
                                         sampler_dense_fraction=2 / 128),
                        training=False)
        assert int(pre.sampler_overflow) > 0
        # overflowed rays are reported non-surface, not garbage
        hits = np.asarray(pre.network_object_mask)
        if hits.sum():
            assert np.abs(np.asarray(f(pre.points))[hits]).max() < 5e-3

    def test_composes_with_sampler_fraction(self):
        f = sphere_sdf()
        cam, d, gt = _ray_fan(seed=34)
        dense = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=3,
                                           sampler_fraction=0.99),
                          training=False)
        pre = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=3,
                                         sampler_fraction=0.99,
                                         sampler_presweep=26,
                                         sampler_dense_fraction=0.99),
                        training=False)
        np.testing.assert_array_equal(np.asarray(dense.network_object_mask),
                                      np.asarray(pre.network_object_mask))


class TestCoarsePhaseCompaction:
    def test_identity_when_coarse_equals_fine(self):
        """Stages ending inside the coarse phase run the coarse fn;
        with coarse == fine the whole chain is the plain trace."""
        f = torus_sdf()
        cam, d, gt = _ray_fan(seed=41)
        full = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=20),
                         training=False)
        chain = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(sphere_tracing_iters=20,
                                           coarse_trace_iters=8,
                                           trace_compact_after=(4, 8, 12),
                                           trace_compact_fraction=(0.99,) * 3,
                                           sampler_coarse=True),
                          training=False, sdf_fn_coarse=f)
        np.testing.assert_array_equal(np.asarray(full.network_object_mask),
                                      np.asarray(chain.network_object_mask))
        np.testing.assert_allclose(np.asarray(full.dists),
                                   np.asarray(chain.dists), atol=1e-4)

    def test_noisy_coarse_stage_hits_stay_fine(self):
        """A noisy coarse fn in coarse-phase stages: claimed hits still
        satisfy |f_fine| small (per-stage fine re-validation)."""
        f = sphere_sdf()

        def f_noisy(x):
            return f(x) + 1e-3 * jnp.sin(1e3 * jnp.sum(x, axis=-1))

        cam, d, gt = _ray_fan(seed=42)
        res = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=24,
                                         coarse_trace_iters=10,
                                         trace_compact_after=(5, 10, 14),
                                         trace_compact_fraction=(0.99,) * 3,
                                         sampler_coarse=True),
                        training=False, sdf_fn_coarse=f_noisy)
        hits = np.asarray(res.network_object_mask)
        assert hits.sum() > 0
        assert np.abs(np.asarray(f(res.points))[hits]).max() < 1e-3


class TestSamplerCoarseMargin:
    def test_margin_recovers_grazing_hits(self):
        """A noisy coarse sampler sweep without the hysteresis margin
        loses grazing hits (false first crossings rejected by the fine
        bracket re-check); with a margin of ~3x the noise the hit
        recall must approach the fine sampler's."""
        f = sphere_sdf()

        def f_noisy(x):
            return f(x) + 1e-3 * jnp.sin(1e3 * jnp.sum(x, axis=-1))

        cam, d, gt = _ray_fan(n=512, seed=51)
        base = dict(sphere_tracing_iters=3)
        fine = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(**base), training=False)
        noisy0 = ray_trace(f, cam, d, gt, jax.random.key(1),
                           RayTracingConfig(sampler_coarse=True, **base),
                           training=False, sdf_fn_coarse=f_noisy)
        noisym = ray_trace(f, cam, d, gt, jax.random.key(1),
                           RayTracingConfig(sampler_coarse=True,
                                            sampler_coarse_margin=4e-3,
                                            **base),
                           training=False, sdf_fn_coarse=f_noisy)
        h_fine = int(np.asarray(fine.network_object_mask).sum())
        h_0 = int(np.asarray(noisy0.network_object_mask).sum())
        h_m = int(np.asarray(noisym.network_object_mask).sum())
        assert h_fine > 0
        # margin recovers nearly all fine-sampler hits...
        assert h_m >= 0.97 * h_fine, (h_m, h_fine)
        # ...and strictly improves on the margin-less coarse sweep
        # whenever that one actually lost hits
        assert h_m >= h_0
        # every claimed hit is on the true surface
        hits = np.asarray(noisym.network_object_mask)
        assert np.abs(np.asarray(f(noisym.points))[hits]).max() < 1e-3

    def test_margin_near_identity_when_coarse_equals_fine(self):
        """With a noise-free coarse fn the margin can only DROP rays
        whose max penetration stays under the margin (documented
        semantics) — no spurious hits, and ≥99% agreement with the
        fine sampler on a clean SDF."""
        f = sphere_sdf()
        cam, d, gt = _ray_fan(n=256, seed=52)
        fine = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=3),
                         training=False)
        marg = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=3,
                                          sampler_coarse=True,
                                          sampler_coarse_margin=1e-3),
                         training=False, sdf_fn_coarse=f)
        h_f = np.asarray(fine.network_object_mask)
        h_m = np.asarray(marg.network_object_mask)
        assert not (h_m & ~h_f).any()          # no spurious hits
        assert (h_m == h_f).mean() >= 0.99     # ≤1% sub-margin drops


class TestFusedWithDistinctCoarse:
    def test_pending_backstep_survives_coarse_stage(self):
        """fused_backstep with a DISTINCT noisy coarse fn and a stage
        chain: the reference-body coarse stages must pass the fused
        pending-backstep state through untouched (regression: they
        clobbered the saved step size), and all claimed hits must lie
        on the true surface."""
        f = sphere_sdf()

        def f_noisy(x):
            return f(x) + 1e-3 * jnp.sin(1e3 * jnp.sum(x, axis=-1))

        cam, d, gt = _ray_fan(n=512, seed=61)
        res = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=24,
                                         coarse_trace_iters=8,
                                         trace_compact_after=(8, 14),
                                         trace_compact_fraction=(0.99,
                                                                 0.99),
                                         trace_compact_coarse=True,
                                         fused_backstep=True,
                                         sampler_coarse=True,
                                         sampler_coarse_margin=4e-3),
                        training=False, sdf_fn_coarse=f_noisy)
        hits = np.asarray(res.network_object_mask)
        fine = ray_trace(f, cam, d, gt, jax.random.key(1),
                         RayTracingConfig(sphere_tracing_iters=24),
                         training=False)
        h_fine = int(np.asarray(fine.network_object_mask).sum())
        assert hits.sum() >= 0.95 * h_fine, (int(hits.sum()), h_fine)
        assert np.abs(np.asarray(f(res.points))[hits]).max() < 1e-3


class TestCoarseStallOnCross:
    def test_recall_matches_reference_path(self):
        """Stall-on-cross with a noisy coarse fn: crossing fronts park
        at their last outside position and the fine phase/sampler
        finish them — hit recall must match the backstepping coarse
        path, and all hits lie on the true surface."""
        f = sphere_sdf()

        def f_noisy(x):
            return f(x) + 1e-3 * jnp.sin(1e3 * jnp.sum(x, axis=-1))

        cam, d, gt = _ray_fan(n=512, seed=71)
        common = dict(sphere_tracing_iters=16, coarse_trace_iters=6,
                      sampler_coarse=True, sampler_coarse_margin=4e-3)
        ref = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(**common),
                        training=False, sdf_fn_coarse=f_noisy)
        stall = ray_trace(f, cam, d, gt, jax.random.key(1),
                          RayTracingConfig(coarse_stall_on_cross=True,
                                           **common),
                          training=False, sdf_fn_coarse=f_noisy)
        h_ref = int(np.asarray(ref.network_object_mask).sum())
        h_st = int(np.asarray(stall.network_object_mask).sum())
        assert h_ref > 0
        assert h_st >= 0.97 * h_ref, (h_st, h_ref)
        hits = np.asarray(stall.network_object_mask)
        assert np.abs(np.asarray(f(stall.points))[hits]).max() < 1e-3

    def test_stalled_fronts_stay_outside(self):
        """No front may end the coarse phase inside the surface (the
        revert keeps acc at a position with f > 0), so the sampler
        interval always contains the true crossing."""
        f = torus_sdf()

        def f_noisy(x):
            return f(x) + 1e-3 * jnp.sin(1e3 * jnp.sum(x, axis=-1))

        cam, d, gt = _ray_fan(n=256, seed=72)
        res = ray_trace(f, cam, d, gt, jax.random.key(1),
                        RayTracingConfig(sphere_tracing_iters=14,
                                         coarse_trace_iters=6,
                                         coarse_stall_on_cross=True,
                                         fused_backstep=True,
                                         sampler_coarse=True,
                                         sampler_coarse_margin=4e-3),
                        training=False, sdf_fn_coarse=f_noisy)
        hits = np.asarray(res.network_object_mask)
        assert hits.sum() > 0
        assert np.abs(np.asarray(f(res.points))[hits]).max() < 1e-3


class TestEndFrontGating:
    """trace_gate_end_front: stop marching a ray's end front once its
    start front is finished. Must be output-equivalent to the ungated
    trace — acc_e is only read as the sampler's t_hi (start-unfinished
    rays, whose end fronts are not gated) and in the acc_s < acc_e hit
    test (freezing acc_e earlier keeps it larger, never flipping a
    genuine hit)."""

    def _run(self, gate, f, extra=None, key=1, seed=31):
        cam, d, gt = _ray_fan(n=512, seed=seed)
        cfg = RayTracingConfig(sphere_tracing_iters=16,
                               sampler_chunk_rays=128,
                               sampler_fraction=0.5,
                               trace_compact_after=(6, 10),
                               trace_compact_fraction=(0.9, 0.7),
                               fused_backstep=True,
                               trace_gate_end_front=gate,
                               **(extra or {}))
        return ray_trace(f, cam, d, gt, jax.random.key(key), cfg,
                         training=True,
                         sdf_fn_coarse=f if extra else None)

    @pytest.mark.parametrize("shape", ["sphere", "torus"])
    def test_matches_ungated(self, shape):
        f = sphere_sdf() if shape == "sphere" else torus_sdf()
        r0 = self._run(False, f)
        r1 = self._run(True, f)
        np.testing.assert_array_equal(
            np.asarray(r0.network_object_mask),
            np.asarray(r1.network_object_mask))
        np.testing.assert_array_equal(np.asarray(r0.sampler_mask),
                                      np.asarray(r1.sampler_mask))
        np.testing.assert_allclose(np.asarray(r0.dists),
                                   np.asarray(r1.dists), atol=1e-6)

    def test_matches_ungated_with_coarse_schedule(self):
        f = torus_sdf()
        extra = dict(coarse_trace_iters=6, coarse_stall_on_cross=True,
                     sampler_coarse=True)
        r0 = self._run(False, f, extra, seed=32)
        r1 = self._run(True, f, extra, seed=32)
        np.testing.assert_array_equal(
            np.asarray(r0.network_object_mask),
            np.asarray(r1.network_object_mask))
        np.testing.assert_allclose(np.asarray(r0.dists),
                                   np.asarray(r1.dists), atol=1e-6)

    def test_gated_hits_on_surface(self):
        f = torus_sdf()
        res = self._run(True, f, seed=33)
        hits = np.asarray(res.network_object_mask)
        assert hits.sum() > 0
        assert np.abs(np.asarray(f(res.points))[hits]).max() < 1e-3

    def test_pending_end_backstep_drains_before_freeze(self):
        """Hand-constructed 1-ray witness for the gate/pending-backstep
        interaction: the field is piecewise-linear in z along the ray
        from (0,0,-2) toward +z (t = z + 2, trace interval t ∈ [1, 3]).

        Iteration 1 (fused backstep): the start front steps
        f(-1) = 0.4 to t = 1.4 where f = 0 → converged (un_s dies);
        the end front steps f(+1) = 1.65 to t = 1.35 — PAST the start
        front and inside the surface (f = -0.5 < 0), scheduling a
        backstep (bk_e = 1). A gate that freezes the end front here
        parks acc_e = 1.35 < acc_s = 1.4 and flips the genuine hit to a
        miss; draining the backstep first recovers acc_e = 2.175 and
        keeps the hit, matching the ungated trace exactly."""
        zs = jnp.array([-2.0, -1.0, -0.9, -0.65, -0.62, -0.6,
                        -0.3, 0.3, 1.0, 2.0])
        gs = jnp.array([1.4, 0.4, -0.3, -0.5, -0.2, 0.0,
                        0.15, 0.45, 1.65, 3.0])
        f = lambda x: jnp.interp(x[..., 2], zs, gs)
        cam = jnp.array([[[0.0, 0.0, -2.0]]])
        d = jnp.array([[[0.0, 0.0, 1.0]]])
        gt = jnp.array([[True]])
        res = {}
        for gate in (False, True):
            cfg = RayTracingConfig(sphere_tracing_iters=16,
                                   fused_backstep=True,
                                   trace_gate_end_front=gate)
            res[gate] = ray_trace(f, cam, d, gt, jax.random.key(0),
                                  cfg, training=False)
        assert bool(res[False].network_object_mask[0, 0]), \
            "witness invalid: ungated trace must register the hit"
        assert bool(res[True].network_object_mask[0, 0]), \
            "gate froze a pending end-front backstep at an overshot " \
            "acc_e < acc_s and flipped the hit to a miss"
        np.testing.assert_allclose(np.asarray(res[False].dists),
                                   np.asarray(res[True].dists),
                                   atol=1e-6)

    @pytest.mark.parametrize("seed", [34, 35, 36])
    def test_matches_ungated_nonmetric_field(self, seed):
        """Over-stepping (non-metric) field: f = 1.5·sphere makes every
        sphere-tracing step overshoot by 50%, so fused END-front
        backsteps (bk_e > 0) provably fire — the only regime where the
        gate and a pending backstep interact. The gate must let a
        pending backstep drain before freezing; freezing mid-backstep
        parks acc_e at an overshot position and can flip a genuine hit
        (acc_s < acc_e) to a miss."""
        base = sphere_sdf()
        f = lambda x: 1.5 * base(x)
        r0 = self._run(False, f, seed=seed)
        r1 = self._run(True, f, seed=seed)
        hits = np.asarray(r0.network_object_mask)
        assert hits.sum() > 0
        np.testing.assert_array_equal(
            hits, np.asarray(r1.network_object_mask))
        np.testing.assert_array_equal(np.asarray(r0.sampler_mask),
                                      np.asarray(r1.sampler_mask))
        np.testing.assert_allclose(np.asarray(r0.dists),
                                   np.asarray(r1.dists), atol=1e-6)
