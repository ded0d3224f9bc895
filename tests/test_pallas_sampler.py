"""In-kernel fused dense ray sampler vs the XLA sampler.

The Pallas sweep kernel (ops/pallas_sampler.py) must be OUTPUT-
EQUIVALENT to models/raytracing._dense_ray_sampler — same first-
crossing pick (incl. the coarse hysteresis margin), same bracket, same
secant, same min-SDF fallback — for both the coarse-sweep
(sampler_coarse + bf16 fn) and fine-sweep variants. Runs in pallas
interpret mode on CPU.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.models.fields import SDFField, SirenField
from isopoints_tpu.models.raytracing import (
    RayTracingConfig,
    _dense_ray_sampler,
    _minimal_sdf_points,
    ray_trace,
)
from isopoints_tpu.ops.pallas_mlp import make_fused_igr_sdf, make_fused_siren_sdf


def _rays(key, n=193):
    """Rays from z=-2 toward the origin region, with t-intervals that
    straddle the geometric-init sphere (some crossing, some missing,
    some degenerate t_lo == t_hi)."""
    k1, k2, k3 = jax.random.split(key, 3)
    cam = jnp.broadcast_to(jnp.array([0.0, 0.0, -2.0]), (1, n, 3))
    ang = jax.random.uniform(k1, (1, n, 2), minval=-0.6, maxval=0.6)
    dirs = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                      jnp.ones((1, n))], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    t_lo = jax.random.uniform(k2, (1, n), minval=0.8, maxval=1.2)
    t_hi = t_lo + jax.random.uniform(k3, (1, n), minval=0.0, maxval=2.2)
    return cam, dirs, t_lo, t_hi


def _assert_sampler_equiv(sdf_fn, sdf_fn_coarse, cfg, key, training=True):
    cam, dirs, t_lo, t_hi = _rays(key)
    obj = jax.random.uniform(jax.random.key(5), t_lo.shape) > 0.3
    smask = jax.random.uniform(jax.random.key(6), t_lo.shape) > 0.2
    args = (key, cam, dirs, obj, t_lo, t_hi, smask)
    cfg_x = dataclasses.replace(cfg, sampler_in_kernel=False)
    cfg_k = dataclasses.replace(cfg, sampler_in_kernel=True)
    p_x, t_x, o_x, _ = _dense_ray_sampler(sdf_fn, *args, cfg_x, training,
                                          sdf_fn_coarse=sdf_fn_coarse)
    p_k, t_k, o_k, _ = _dense_ray_sampler(sdf_fn, *args, cfg_k, training,
                                          sdf_fn_coarse=sdf_fn_coarse)
    np.testing.assert_array_equal(np.asarray(o_k), np.asarray(o_x))
    np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_x),
                               atol=1e-5, rtol=1e-5)


class TestFusedSamplerIGR:
    def setup_method(self):
        self.field = SDFField(hidden_size=64, n_layers=4, num_frequencies=0)
        self.params = self.field.init(jax.random.key(0))
        self.sdf, _ = make_fused_igr_sdf(self.field, self.params,
                                         interpret=True)
        self.sdf_bf16, _ = make_fused_igr_sdf(self.field, self.params,
                                              interpret=True,
                                              precision="bf16")

    def test_fine_sweep_equivalence(self):
        cfg = RayTracingConfig(n_steps=24, n_secant_steps=8)
        _assert_sampler_equiv(self.sdf, None, cfg, jax.random.key(1))

    def test_coarse_sweep_equivalence(self):
        # coarse bf16 sweep + margin + fine bracket re-validation: the
        # in-kernel coarse sweep reads the bf16-hi half of the fine
        # fn's own weight pack — bit-identical to the 'bf16' variant
        cfg = RayTracingConfig(n_steps=24, n_secant_steps=8,
                               sampler_coarse=True,
                               sampler_coarse_margin=2e-3)
        _assert_sampler_equiv(self.sdf, self.sdf_bf16, cfg,
                              jax.random.key(2))

    def test_eval_mode_equivalence(self):
        cfg = RayTracingConfig(n_steps=16, n_secant_steps=4)
        _assert_sampler_equiv(self.sdf, None, cfg, jax.random.key(3),
                              training=False)

    def test_minimal_sdf_points_equivalence(self):
        cam, dirs, t_lo, t_hi = _rays(jax.random.key(4))
        key = jax.random.key(7)
        p_x, t_x = _minimal_sdf_points(self.sdf, key, cam, dirs, t_lo,
                                       t_hi, 24, in_kernel=False)
        p_k, t_k = _minimal_sdf_points(self.sdf, key, cam, dirs, t_lo,
                                       t_hi, 24, in_kernel=True)
        np.testing.assert_allclose(np.asarray(t_k), np.asarray(t_x),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(p_k), np.asarray(p_x),
                                   atol=1e-6)

    def test_ray_trace_end_to_end(self):
        # the full pipeline (trace + sampler + training fallbacks) with
        # the in-kernel sampler on/off, bench-style schedule
        cam, dirs, _, _ = _rays(jax.random.key(8), n=128)
        obj = jnp.ones(dirs.shape[:-1], bool)
        base = dict(sphere_tracing_iters=8, n_steps=16, n_secant_steps=4,
                    coarse_trace_iters=3, sampler_coarse=True,
                    sampler_coarse_margin=2e-3, coarse_stall_on_cross=True,
                    fused_backstep=True, trace_gate_end_front=True)
        r_x = ray_trace(self.sdf, cam, dirs, obj, jax.random.key(9),
                        RayTracingConfig(**base), training=True,
                        sdf_fn_coarse=self.sdf_bf16)
        r_k = ray_trace(self.sdf, cam, dirs, obj, jax.random.key(9),
                        RayTracingConfig(sampler_in_kernel=True, **base),
                        training=True, sdf_fn_coarse=self.sdf_bf16)
        np.testing.assert_array_equal(np.asarray(r_k.network_object_mask),
                                      np.asarray(r_x.network_object_mask))
        np.testing.assert_allclose(np.asarray(r_k.dists),
                                   np.asarray(r_x.dists), atol=1e-5,
                                   rtol=1e-5)


class TestInKernelTrace:
    """trace_in_kernel: the compacted fine fused-backstep stages run
    inside ops/pallas_trace.py with bit-identical per-iteration math —
    the full bidirectional trace must match the XLA while_loop path."""

    def setup_method(self):
        self.field = SDFField(hidden_size=64, n_layers=4, num_frequencies=0)
        self.params = self.field.init(jax.random.key(0))
        self.sdf, _ = make_fused_igr_sdf(self.field, self.params,
                                         interpret=True)
        self.sdf_bf16, _ = make_fused_igr_sdf(self.field, self.params,
                                              interpret=True,
                                              precision="bf16")

    @pytest.mark.parametrize("gate", [True, False])
    def test_staged_trace_equivalence(self, gate):
        cam, dirs, _, _ = _rays(jax.random.key(20), n=192)
        obj = jnp.ones(dirs.shape[:-1], bool)
        base = dict(sphere_tracing_iters=14, n_steps=8, n_secant_steps=2,
                    coarse_trace_iters=4, sampler_coarse=True,
                    coarse_stall_on_cross=True, fused_backstep=True,
                    trace_compact_after=(4, 8),
                    trace_compact_fraction=(0.8, 0.5),
                    trace_gate_end_front=gate)
        r_x = ray_trace(self.sdf, cam, dirs, obj, jax.random.key(21),
                        RayTracingConfig(**base), training=False,
                        sdf_fn_coarse=self.sdf_bf16)
        r_k = ray_trace(self.sdf, cam, dirs, obj, jax.random.key(21),
                        RayTracingConfig(trace_in_kernel=True, **base),
                        training=False, sdf_fn_coarse=self.sdf_bf16)
        np.testing.assert_array_equal(np.asarray(r_k.network_object_mask),
                                      np.asarray(r_x.network_object_mask))
        np.testing.assert_array_equal(np.asarray(r_k.sampler_mask),
                                      np.asarray(r_x.sampler_mask))
        # not bitwise under CPU interpret: XLA:CPU picks shape-dependent
        # dot reduction blockings, so the (2T)-row in-kernel eval and
        # the fused fn's 1024-row tiles round differently (~1e-6/eval);
        # a near-threshold front may then stop one iteration later —
        # both stops satisfy |f| <= thr, so dists agree to a few
        # thresholds.
        np.testing.assert_allclose(np.asarray(r_k.dists),
                                   np.asarray(r_x.dists), atol=2e-4)

    def test_mixed_coarse_stage_falls_back(self):
        # a stage ending inside the coarse phase must keep the XLA
        # path (stage_coarse) while later stages go in-kernel
        cam, dirs, _, _ = _rays(jax.random.key(22), n=128)
        obj = jnp.ones(dirs.shape[:-1], bool)
        base = dict(sphere_tracing_iters=12, n_steps=8, n_secant_steps=2,
                    coarse_trace_iters=6, sampler_coarse=True,
                    coarse_stall_on_cross=True, fused_backstep=True,
                    trace_compact_after=(3, 6, 9),
                    trace_compact_fraction=(0.9, 0.7, 0.5),
                    trace_compact_coarse=False)
        r_x = ray_trace(self.sdf, cam, dirs, obj, jax.random.key(23),
                        RayTracingConfig(**base), training=False,
                        sdf_fn_coarse=self.sdf_bf16)
        r_k = ray_trace(self.sdf, cam, dirs, obj, jax.random.key(23),
                        RayTracingConfig(trace_in_kernel=True, **base),
                        training=False, sdf_fn_coarse=self.sdf_bf16)
        np.testing.assert_array_equal(np.asarray(r_k.network_object_mask),
                                      np.asarray(r_x.network_object_mask))
        # a near-threshold front may stop one iteration later under
        # ~1e-6 eval roundoff; both stops satisfy |f| <= thr, landing
        # within a few thresholds of each other
        np.testing.assert_allclose(np.asarray(r_k.dists),
                                   np.asarray(r_x.dists), atol=2e-4)


class TestFusedSamplerSiren:
    def setup_method(self):
        self.field = SirenField(hidden_size=64, n_layers=2)
        self.params = self.field.init(jax.random.key(0))
        self.sdf, _ = make_fused_siren_sdf(self.field, self.params,
                                           interpret=True)
        self.sdf_bf16, _ = make_fused_siren_sdf(self.field, self.params,
                                                interpret=True,
                                                precision="bf16")

    def test_fine_sweep_equivalence(self):
        cfg = RayTracingConfig(n_steps=20, n_secant_steps=6)
        _assert_sampler_equiv(self.sdf, None, cfg, jax.random.key(11))

    def test_coarse_sweep_equivalence(self):
        cfg = RayTracingConfig(n_steps=20, n_secant_steps=6,
                               sampler_coarse=True,
                               sampler_coarse_margin=2e-3)
        _assert_sampler_equiv(self.sdf, self.sdf_bf16, cfg,
                              jax.random.key(12))


class TestPlainFnFallback:
    def test_non_fused_fn_ignores_flag(self):
        # a plain closure has no .fused_ray_sampler: the flag must fall
        # back to the XLA path, not crash
        sphere = lambda x: jnp.linalg.norm(x, axis=-1) - 0.6
        cam, dirs, t_lo, t_hi = _rays(jax.random.key(13), n=64)
        obj = jnp.ones(t_lo.shape, bool)
        cfg = RayTracingConfig(n_steps=16, sampler_in_kernel=True)
        p, t, o, _ = _dense_ray_sampler(sphere, jax.random.key(14), cam,
                                        dirs, obj, t_lo, t_hi, obj, cfg,
                                        True)
        cfg0 = RayTracingConfig(n_steps=16)
        p0, t0, o0, _ = _dense_ray_sampler(sphere, jax.random.key(14), cam,
                                           dirs, obj, t_lo, t_hi, obj, cfg0,
                                           True)
        np.testing.assert_array_equal(np.asarray(o), np.asarray(o0))
        np.testing.assert_allclose(np.asarray(t), np.asarray(t0), atol=0)
