"""Probe the unconverged-ray decay / hit recall of the bench trace schedule.

Two modes:
  trace (default): for a sweep of (gate, iters, stages, fracs) variants,
    report the post-trace unconverged count (how many rays the dense
    sampler must sweep), the compaction overflow, and trace-only wall
    time. Used to decide whether extra narrow-width fused iterations can
    drop a whole 8192-ray sampler chunk (each chunk costs ~8-9 ms of
    dense sweeping; see PERF.md "Where the time goes").
  full: run the FULL ray_trace pipeline for candidate configs plus the
    all-fine oracle (fine precision everywhere, every ray swept densely)
    and report hit counts, recall vs the oracle, and steady-state time.

Run on the real TPU: `python scripts/probe_trace_decay.py [full]`.
"""

import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

sys.path.insert(0, ".")

from bench import N_RAYS, _fit_sphere_field  # noqa: E402

from isopoints_tpu.models.fields import SDFField  # noqa: E402
from isopoints_tpu.models.raytracing import (  # noqa: E402
    RayTracingConfig,
    _bidirectional_sphere_trace,
    intersection_with_unit_sphere,
    ray_trace,
)

# bench-candidate schedules under test: (label, gate, iters, stages, fracs)
TRACE_VARIANTS = [
    ("control-r2", False, 13, (6, 9), (0.70, 0.45)),
    ("21it", False, 21, (6, 9, 13, 17), (0.70, 0.45, 0.22, 0.15)),
    ("21it-gated", True, 21, (6, 9, 13, 17), (0.70, 0.45, 0.22, 0.15)),
    ("21it-gated-tight", True, 21, (6, 9, 13, 17), (0.62, 0.38, 0.19, 0.13)),
    ("21it-gated-tighter", True, 21, (6, 9, 13, 17), (0.55, 0.33, 0.17, 0.12)),
]


def _setup():
    field = SDFField(hidden_size=256, n_layers=4, num_frequencies=0)
    params = field.init(jax.random.key(0))
    params, fit_mse = _fit_sphere_field(field, params)
    print(f"field fitted, mse {fit_mse:.2e}", file=sys.stderr)
    if jax.default_backend() == "tpu":
        from isopoints_tpu.ops.pallas_mlp import make_fused_igr_sdf
        sdf, _ = make_fused_igr_sdf(field, params, precision="f32x3")
        sdf_bf16, _ = make_fused_igr_sdf(field, params, precision="bf16")
    else:
        sdf = lambda x: field.sdf(params, x)  # noqa: E731
        sdf_bf16 = sdf

    key = jax.random.key(1)
    cam = jnp.asarray([0.0, 0.0, -2.0])
    ang = jax.random.uniform(key, (1, N_RAYS, 2), minval=-0.35, maxval=0.35)
    dirs = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                      jnp.ones((1, N_RAYS))], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam_b = jnp.broadcast_to(cam, dirs.shape)
    return sdf, sdf_bf16, cam_b, dirs


def _cfg(gate, iters, stages, fracs, sampler_chunks=6):
    return RayTracingConfig(sphere_tracing_iters=iters,
                            sampler_chunk_rays=8192,
                            sampler_fraction=sampler_chunks * 8192 / N_RAYS,
                            trace_compact_after=stages,
                            trace_compact_fraction=fracs,
                            coarse_trace_iters=6,
                            sampler_coarse=True,
                            sampler_coarse_margin=2e-3,
                            coarse_stall_on_cross=True,
                            fused_backstep=True,
                            trace_gate_end_front=gate)


def probe_trace(sdf, sdf_bf16, cam_b, dirs):
    near, far, mask_int = intersection_with_unit_sphere(cam_b, dirs)
    t_near = jnp.sum((near - cam_b) * dirs, axis=-1)
    t_far = jnp.sum((far - cam_b) * dirs, axis=-1)

    for label, gate, iters, stages, fracs in TRACE_VARIANTS:
        cfg = _cfg(gate, iters, stages, fracs)

        @jax.jit
        def trace():
            acc_s, acc_e, un_s, ovf = _bidirectional_sphere_trace(
                sdf, cam_b, dirs, mask_int, t_near, t_far, cfg,
                sdf_fn_coarse=sdf_bf16)
            return jnp.sum(un_s.astype(jnp.int32)), ovf, acc_s.mean()

        out = trace()
        jax.block_until_ready(out)
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            out = trace()
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        unconv, ovf = int(out[0]), int(out[1])
        chunks = -(-unconv // 8192)
        print(f"{label}: unconverged={unconv} ({chunks} chunks of 8192) "
              f"overflow={ovf} trace_time={min(ts)*1e3:.1f} ms",
              flush=True)


def probe_full(sdf, sdf_bf16, cam_b, dirs):
    """Full ray_trace: hits + recall vs the all-fine oracle + time."""
    gt = jnp.ones(dirs.shape[:-1], dtype=bool)
    oracle_cfg = RayTracingConfig(sphere_tracing_iters=13,
                                  sampler_chunk_rays=8192,
                                  sampler_fraction=1.0)

    candidates = [
        ("control-r2", _cfg(False, 13, (6, 9), (0.70, 0.45), 6)),
        ("21it-gated", _cfg(True, 21, (6, 9, 13, 17),
                            (0.65, 0.42, 0.21, 0.14), 3)),
    ]

    def run(cfg, coarse):
        @jax.jit
        def f(k):
            res = ray_trace(sdf, cam_b, dirs, gt, k, cfg, training=False,
                            sdf_fn_coarse=sdf_bf16 if coarse else None)
            return (res.network_object_mask, res.trace_overflow,
                    res.sampler_overflow)
        out = f(jax.random.key(2))
        jax.block_until_ready(out)
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            out = f(jax.random.key(2))
            jax.block_until_ready(out)
            ts.append(time.perf_counter() - t0)
        return out, min(ts)

    (o_mask, *_), o_t = run(oracle_cfg, coarse=False)
    o_hits = int(o_mask.sum())
    print(f"oracle(all-fine, full sweep): hits={o_hits} "
          f"time={o_t*1e3:.1f} ms", flush=True)

    for label, cfg in candidates:
        (mask, t_ovf, s_ovf), t = run(cfg, coarse=True)
        hits = int(mask.sum())
        both = int((mask & o_mask).sum())
        print(f"{label}: hits={hits} recall={both/max(o_hits,1):.4f} "
              f"extra={hits-both} trace_ovf={int(t_ovf)} "
              f"sampler_ovf={int(s_ovf)} time={t*1e3:.1f} ms", flush=True)


def main():
    sdf, sdf_bf16, cam_b, dirs = _setup()
    if "full" in sys.argv[1:]:
        probe_full(sdf, sdf_bf16, cam_b, dirs)
    else:
        probe_trace(sdf, sdf_bf16, cam_b, dirs)


if __name__ == "__main__":
    main()
