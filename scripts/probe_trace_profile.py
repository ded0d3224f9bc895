"""Capture a jax.profiler trace of ONE bench-config trace dispatch and
print the top device ops by total duration (parsed straight from the
trace protobuf/json — no TensorBoard needed).

  python scripts/probe_trace_profile.py [--outdir /tmp/traceprof]
"""

import argparse
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--outdir", default="/tmp/traceprof")
    ap.add_argument("--top", type=int, default=40)
    args = ap.parse_args()

    from bench import _fit_sphere_field
    from isopoints_tpu.models.fields import SDFField
    from isopoints_tpu.models.raytracing import RayTracingConfig, ray_trace
    from isopoints_tpu.ops.pallas_mlp import make_fused_igr_sdf

    field = SDFField(hidden_size=256, n_layers=4, num_frequencies=0)
    params = field.init(jax.random.key(0))
    params, _ = _fit_sphere_field(field, params)
    sdf, _ = make_fused_igr_sdf(field, params, precision="f32x3")
    sdf_bf16, _ = make_fused_igr_sdf(field, params, precision="bf16")

    N = 262_144
    key = jax.random.key(1)
    cam = jnp.asarray([0.0, 0.0, -2.0])
    ang = jax.random.uniform(key, (1, N, 2), minval=-0.35, maxval=0.35)
    dirs = jnp.stack([jnp.tan(ang[..., 0]), jnp.tan(ang[..., 1]),
                      jnp.ones((1, N))], axis=-1)
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    cam_b = jnp.broadcast_to(cam, dirs.shape)
    gt = jnp.ones(dirs.shape[:-1], dtype=bool)
    cfg = RayTracingConfig(sphere_tracing_iters=21, sampler_chunk_rays=8192,
                           sampler_fraction=0.09375,
                           trace_compact_after=(6, 9, 13, 17),
                           trace_compact_fraction=(0.65, 0.42, 0.21, 0.14),
                           coarse_trace_iters=6, sampler_coarse=True,
                           sampler_coarse_margin=2e-3,
                           coarse_stall_on_cross=True, fused_backstep=True,
                           trace_gate_end_front=True, sampler_in_kernel=True)

    @jax.jit
    def trace(d):
        res = ray_trace(sdf, cam_b, d, gt, jax.random.key(2), cfg,
                        training=False, sdf_fn_coarse=sdf_bf16)
        return res.dists.mean(), res.network_object_mask.sum()

    out = trace(dirs)
    jax.block_until_ready(out)

    with jax.profiler.trace(args.outdir):
        out = trace(dirs)
        jax.block_until_ready(out)

    # parse the trace-event json
    files = glob.glob(os.path.join(args.outdir, "**", "*.trace.json.gz"),
                      recursive=True)
    assert files, f"no trace files under {args.outdir}"
    path = max(files, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    evs = [e for e in data.get("traceEvents", [])
           if e.get("ph") == "X" and "dur" in e]
    # keep device-lane events (TPU op track): heuristic — pid/tid names
    # containing 'TPU' / 'XLA Ops'
    names = {}
    for e in data.get("traceEvents", []):
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {p for p, n in names.items()
                if "TPU" in n or "/device" in n.lower()}
    agg = {}
    total = 0
    for e in evs:
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        nm = e["name"].split(".")[0]
        agg[nm] = agg.get(nm, 0) + e["dur"]
        total += e["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[:args.top]
    print(f"trace file: {path}")
    print(f"total device op time: {total/1e3:.2f} ms")
    for nm, dur in rows:
        print(f"{dur/1e3:9.3f} ms  {100*dur/max(total,1):5.1f}%  {nm}")


if __name__ == "__main__":
    main()
