"""Head-to-head: XLA dense sampler vs the in-kernel Pallas sampler.

Times ONLY the dense-sampler stage at the bench workload's shape
(24576 rays x 100 steps, coarse sweep + fine bracket + 8-step secant)
on the real TPU. Scan-amortized like bench.py.

  python scripts/probe_sampler_perf.py [--rays 24576] [--steps 100]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=24576)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--rep", type=int, default=8)
    ap.add_argument("--tile", type=int, default=0,
                    help="override pallas_sampler._TILE")
    args = ap.parse_args()

    from isopoints_tpu.models.fields import SDFField
    from isopoints_tpu.models.raytracing import (
        RayTracingConfig,
        _dense_ray_sampler,
    )
    from isopoints_tpu.ops import pallas_sampler
    from isopoints_tpu.ops.pallas_mlp import make_fused_igr_sdf

    if args.tile:
        pallas_sampler._TILE = args.tile

    field = SDFField(hidden_size=256, n_layers=4, num_frequencies=0)
    params = field.init(jax.random.key(0))
    sdf, _ = make_fused_igr_sdf(field, params, precision="f32x3")
    sdf_bf16, _ = make_fused_igr_sdf(field, params, precision="bf16")

    n = args.rays
    key = jax.random.key(1)
    cam = jnp.broadcast_to(jnp.array([0.0, 0.0, -2.0]), (1, n, 3))
    ang = jax.random.uniform(key, (1, n, 2), minval=-0.35, maxval=0.35)
    dirs = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                      jnp.ones((1, n))], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    t_lo = jnp.full((1, n), 1.2)
    t_hi = jnp.full((1, n), 2.8)
    obj = jnp.ones((1, n), bool)

    def run(in_kernel):
        cfg = RayTracingConfig(n_steps=args.steps, sampler_chunk_rays=8192,
                               sampler_coarse=True,
                               sampler_coarse_margin=2e-3,
                               sampler_in_kernel=in_kernel)

        @jax.jit
        def f(d0):
            def step(carry, _):
                d = d0 + 1e-30 * carry
                p, t, o, _ = _dense_ray_sampler(
                    sdf, jax.random.key(3), cam, d, obj, t_lo, t_hi, obj,
                    cfg, False, sdf_fn_coarse=sdf_bf16)
                return t.mean(), (t, o)
            _, (ts, os) = jax.lax.scan(step, jnp.float32(0), None,
                                       length=args.rep)
            return ts[-1], os[-1]

        out = f(dirs)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = f(dirs)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / args.rep)
        return best, out

    t_x, out_x = run(False)
    t_k, out_k = run(True)
    import numpy as np
    dmax = float(jnp.max(jnp.abs(out_x[0] - out_k[0])))
    mask_eq = bool(jnp.all(out_x[1] == out_k[1]))
    print(f"rays={args.rays} steps={args.steps} rep={args.rep} "
          f"tile={pallas_sampler._TILE}")
    print(f"xla_sampler:      {t_x*1e3:8.2f} ms")
    print(f"inkernel_sampler: {t_k*1e3:8.2f} ms   "
          f"({t_x/t_k:.2f}x)  dmax_t={dmax:.2e} mask_eq={mask_eq}")


if __name__ == "__main__":
    main()
