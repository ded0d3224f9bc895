#!/usr/bin/env python
"""Bisect the it=1000 iso-arm resample crash (VERDICT r4 item 1b).

Loads the crashing checkpoint's params (out/ablation_uni/model.npz,
saved at it=972 — the field state that deterministically kernel-faults
the resample pipeline on the real TPU) and runs the
sample_uniform_iso_points sub-stages one by one, each forced with
block_until_ready, printing a stage banner BEFORE dispatch so the
faulting stage is identified by the last banner in the teed log.

Usage: python scripts/probe_resample_crash.py [--arm uni] [--seed 7]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arm", default="uni")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--n-points", type=int, default=6000)
    ap.add_argument("--no-fused", action="store_true",
                    help="use the plain XLA sdf path instead of the "
                    "fused Pallas MLP (isolates pallas_mlp)")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    from isopoints_tpu.config import load_config
    from isopoints_tpu.factories import create_model
    from isopoints_tpu.misc.checkpoints import CheckpointIO
    from isopoints_tpu.models.levelset import project_points_newton
    from isopoints_tpu.ops.points import midpoint_upsample, wlop

    d = f"out/ablation_{args.arm}"
    cfg = load_config(os.path.join(d, "config.yaml"))
    if args.no_fused:
        cfg["model"]["implicit_kwargs"]["use_fused_mlp"] = False
        cfg["model"]["implicit_kwargs"]["coarse_trace_iters"] = 0
    model = create_model(cfg)
    ckio = CheckpointIO(d)
    ckio.registry["model"] = model.init(jax.random.key(0))
    scalars = ckio.load("model.npz")
    params = ckio.registry["model"]
    print(f"[probe] checkpoint it={scalars.get('it')} loaded", flush=True)

    f = model.trace_sdf_fn(params)
    pcfg = model.proj_cfg
    n = args.n_points
    key = jax.random.key(args.seed)
    k1, k2 = jax.random.split(key)

    import time

    def stage(name, fn):
        t0 = time.time()
        print(f"[probe] STAGE {name}: dispatch t={t0:.1f}", flush=True)
        out = fn()
        jax.block_until_ready(out)
        print(f"[probe] STAGE {name}: OK (+{time.time() - t0:.1f}s)",
              flush=True)
        # async-fault canary: TPU kernel faults can surface at the NEXT
        # dispatch, mis-attributing the guilty stage — give the worker a
        # beat, then sync a trivial op so a lingering fault lands HERE
        time.sleep(1.0)
        jax.block_until_ready(jnp.zeros(8) + 1.0)
        print(f"[probe] STAGE {name}: canary clean", flush=True)
        return out

    r = cfg["model"]["implicit_kwargs"].get("object_bounding_sphere", 1.0)
    init_points = (jax.random.uniform(k1, (1, n * 4, 3)) - 0.5) * 2.0 * r
    mask0 = jnp.ones(init_points.shape[:2], dtype=bool)

    # stage 0: plain field eval on the bootstrap cube points
    stage("eval_cube", lambda: f(init_points.reshape(-1, 3)))

    # stage 1: Newton projection of the 4x oversampled cube points
    proj = stage("project_bootstrap", lambda: project_points_newton(
        f, init_points, mask0, max_iters=pcfg.proj_max_iters,
        tolerance=pcfg.proj_tolerance))
    inside = jnp.linalg.norm(proj.points, axis=-1) < r
    valid = proj.mask & inside
    print(f"[probe] projected: {int(valid.sum())}/{valid.size} valid, "
          f"nan={int(jnp.isnan(proj.points).sum())}", flush=True)

    # stage 2: WLOP consolidation
    ratio = max(min(0.5, n / init_points.shape[1]), 1e-3)
    x, x_mask = stage("wlop", lambda: wlop(proj.points, valid, k2,
                                           ratio=ratio))
    print(f"[probe] wlop: {int(x_mask.sum())}/{x_mask.size} valid, "
          f"nan={int(jnp.isnan(x).sum())}", flush=True)

    # stage 3: re-projection
    proj2 = stage("project_wlop", lambda: project_points_newton(
        f, x, x_mask, max_iters=10, tolerance=pcfg.proj_tolerance))
    import numpy as np
    np.savez("/tmp/upsample_input.npz",
             points=np.asarray(proj2.points), mask=np.asarray(proj2.mask),
             n=n)
    print("[probe] saved upsample inputs to /tmp/upsample_input.npz",
          flush=True)

    # stage 4: midpoint upsample to n
    up, up_mask = stage("upsample", lambda: midpoint_upsample(
        proj2.points, proj2.mask, n, neighborhood_size=16))
    print(f"[probe] upsample: {int(up_mask.sum())}/{up_mask.size} valid, "
          f"nan={int(jnp.isnan(up).sum())}", flush=True)

    # stage 5: final projection
    final = stage("project_final", lambda: project_points_newton(
        f, up, up_mask, max_iters=10, tolerance=pcfg.proj_tolerance))
    print(f"[probe] final: {int(final.mask.sum())}/{final.mask.size} "
          f"valid — PIPELINE COMPLETE, no fault", flush=True)


if __name__ == "__main__":
    main()
