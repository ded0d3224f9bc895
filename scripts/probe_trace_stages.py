"""Stage-cost decomposition of the bench trace pipeline on the TPU.

Times ray_trace under config variants that switch stages off, so the
per-stage cost (incl. glue the stage drags in) is the difference
between rows. Scan-amortized like bench.py. Prints one row per
variant; diff rows by eye.

  python scripts/probe_trace_stages.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from isopoints_tpu.models.fields import SDFField
from isopoints_tpu.models.raytracing import RayTracingConfig, ray_trace
from isopoints_tpu.ops.pallas_mlp import make_fused_igr_sdf

N_RAYS = 262_144
REP = 4

BASE = dict(sphere_tracing_iters=21,
            sampler_chunk_rays=8192,
            sampler_fraction=0.09375,
            trace_compact_after=(6, 9, 13, 17),
            trace_compact_fraction=(0.65, 0.42, 0.21, 0.14),
            coarse_trace_iters=6,
            sampler_coarse=True,
            sampler_coarse_margin=2e-3,
            coarse_stall_on_cross=True,
            fused_backstep=True,
            trace_gate_end_front=True,
            sampler_in_kernel=True)

VARIANTS = [
    # full bench config + in-kernel fused-backstep marching stages
    ("full_inkernel_trace", dict(trace_in_kernel=True)),
    # full bench config (reference row)
    ("full", {}),
    # sampler shrunk to 2 steps/0 secant: full - sampler cost
    ("tiny_sampler", dict(n_steps=2, n_secant_steps=0)),
    # + no fine compacted stages: loop ends right after coarse+reval
    ("coarse_only", dict(n_steps=2, n_secant_steps=0,
                         sphere_tracing_iters=6,
                         trace_compact_after=0,
                         trace_compact_fraction=0.25)),
    # + 1 coarse iter: fixed pipeline overhead floor
    ("one_iter", dict(n_steps=2, n_secant_steps=0,
                      sphere_tracing_iters=1, coarse_trace_iters=1,
                      trace_compact_after=0,
                      trace_compact_fraction=0.25)),
    # full with the XLA sampler (in-kernel off), for the record
    ("full_xla_sampler", dict(sampler_in_kernel=False)),
]


def main():
    import sys

    field = SDFField(hidden_size=256, n_layers=4, num_frequencies=0)
    params = field.init(jax.random.key(0))
    # same fitted field as bench.py so active-ray decay matches
    from bench import _fit_sphere_field
    params, _ = _fit_sphere_field(field, params)
    sdf, _ = make_fused_igr_sdf(field, params, precision="f32x3")
    sdf_bf16, _ = make_fused_igr_sdf(field, params, precision="bf16")

    key = jax.random.key(1)
    cam = jnp.asarray([0.0, 0.0, -2.0])
    ang = jax.random.uniform(key, (1, N_RAYS, 2), minval=-0.35, maxval=0.35)
    dirs = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                      jnp.ones((1, N_RAYS))], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam_b = jnp.broadcast_to(cam, dirs.shape)
    gt = jnp.ones(dirs.shape[:-1], dtype=bool)

    for name, over in VARIANTS:
        cfg = RayTracingConfig(**{**BASE, **over})

        @jax.jit
        def trace(k):
            def step(carry, kk):
                d_i = dirs + 1e-30 * carry
                res = ray_trace(sdf, cam_b, d_i, gt, kk, cfg,
                                training=False, sdf_fn_coarse=sdf_bf16)
                return res.dists.mean(), (res.dists,
                                          res.network_object_mask)
            _, outs = jax.lax.scan(step, jnp.float32(0),
                                   jax.random.split(k, REP))
            return outs[0][-1], outs[1][-1]

        out = trace(jax.random.key(2))
        jax.block_until_ready(out)
        best = 1e9
        for i in range(3):
            t0 = time.perf_counter()
            out = trace(jax.random.key(3 + i))
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / REP)
        hits = int(out[1].sum())
        print(f"{name:18s} {best*1e3:8.2f} ms/trace   hits={hits}",
              flush=True)


if __name__ == "__main__":
    main()
