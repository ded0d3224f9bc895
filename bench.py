"""Headline benchmark: sphere-traced rays/s on one chip.

Runs the full IDR ray-tracing pipeline (bidirectional sphere tracing +
dense sampler + secant; DSS/models/levelset_sampling.py:810-1168
semantics) against a reference-scale SIREN SDF (3×256, the
test_dtu_points.py:216-226 decoder) and reports ray throughput.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against a nominal 1.0e6 rays/s estimate for the
reference's chunked CUDA sphere tracer (the reference publishes no
numbers — BASELINE.md; 80k-pixel chunks at ~12 SDF evals/ray on a
2021-era GPU ≈ 1e6 rays/s is the generous order-of-magnitude anchor).
"""

import json
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from isopoints_tpu.models.fields import SDFField
from isopoints_tpu.models.raytracing import RayTracingConfig, ray_trace

BASELINE_RAYS_PER_S = 1.0e6

N_RAYS = 262_144      # rays per call
N_ITERS = 5           # timed calls
SPHERE_TRACING_ITERS = 10


def main():
    # IGR SDF with geometric init ≈ an r=0.6 sphere: every ray does real
    # tracing work (no trivial early exit). The fused Pallas MLP keeps
    # the weight stack in VMEM and streams rays (ops/pallas_mlp.py).
    field = SDFField(hidden_size=256, n_layers=4, num_frequencies=0)
    params = field.init(jax.random.key(0))
    if jax.default_backend() == "tpu":
        from isopoints_tpu.ops.pallas_mlp import make_fused_igr_sdf
        # measured: default precision wins for the iterative trace
        # (1.92M vs 1.80M rays/s); bf16 wins for big batched evals
        # (projections 785k -> 1.05M/s), used below
        sdf, _ = make_fused_igr_sdf(field, params, bf16=False)
        sdf_proj, _ = make_fused_igr_sdf(field, params, bf16=True)
    else:
        sdf = lambda x: field.sdf(params, x)
        sdf_proj = sdf

    key = jax.random.key(1)
    cam = jnp.asarray([0.0, 0.0, -2.0])
    ang = jax.random.uniform(key, (1, N_RAYS, 2), minval=-0.35, maxval=0.35)
    dirs = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                      jnp.ones((1, N_RAYS))], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam_b = jnp.broadcast_to(cam, dirs.shape)
    gt = jnp.ones(dirs.shape[:-1], dtype=bool)
    cfg = RayTracingConfig(sphere_tracing_iters=SPHERE_TRACING_ITERS,
                           sampler_chunk_rays=8192,
                           sampler_fraction=0.25,
                           # straggler compaction: measured 1.93 -> 2.51M
                           # rays/s (most rays finish in <=3 iterations)
                           trace_compact_after=3,
                           trace_compact_fraction=0.125)

    @jax.jit
    def trace(k):
        res = ray_trace(sdf, cam_b, dirs, gt, k, cfg, training=False)
        return res.dists, res.network_object_mask

    # compile + warmup
    out = trace(jax.random.key(2))
    jax.block_until_ready(out)

    times = []
    for i in range(N_ITERS):
        t0 = time.perf_counter()
        out = trace(jax.random.key(3 + i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)

    dt = min(times)
    rays_per_s = N_RAYS / dt

    # roofline accounting (stderr; BASELINE asks for speed-of-light
    # accounting per kernel): estimate total MLP evals this trace does
    import sys

    from isopoints_tpu.utils.profiling import mlp_eval_roofline

    cfg_obj = cfg
    # UPPER BOUND on evals (the while_loop early-exits converged rays,
    # so reported utilization is an upper bound too)
    evals_per_ray = (
        2 * (cfg_obj.sphere_tracing_iters + 1) * (1 + cfg_obj.line_step_iters)
        + cfg_obj.sampler_fraction * (cfg_obj.n_steps + cfg_obj.n_secant_steps))
    n_evals = int(N_RAYS * evals_per_ray)
    rl = mlp_eval_roofline("sphere_trace_mlp", n_evals,
                           [3, 256, 256, 256, 256, 1], dt)
    print(rl.report(), "(upper bound: early-exit rays counted full)",
          file=sys.stderr)

    # secondary BASELINE metric: iso-point Newton projections/s
    from isopoints_tpu.models.levelset import project_points_newton

    n_pts = 65536 if jax.default_backend() == "tpu" else 1024
    pts0 = jax.random.uniform(jax.random.key(9), (1, n_pts, 3),
                              minval=-0.8, maxval=0.8)
    pmask = jnp.ones((1, n_pts), bool)

    @jax.jit
    def project(p):
        return project_points_newton(sdf_proj, p, pmask, max_iters=10,
                                     tolerance=1e-5)

    out2 = project(pts0)
    jax.block_until_ready(out2)
    pt = []
    for _ in range(3):
        t0 = time.perf_counter()
        out2 = project(pts0)
        jax.block_until_ready(out2)
        pt.append(time.perf_counter() - t0)
    print(f"iso_point_projections_per_s: {n_pts/min(pt):.0f} "
          f"(converged {int(out2.mask.sum())}/{n_pts})", file=sys.stderr)

    print(json.dumps({
        "metric": "sphere_traced_rays_per_s_per_chip",
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
    }))


if __name__ == "__main__":
    main()
