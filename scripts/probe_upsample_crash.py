#!/usr/bin/env python
"""Minimal repro driver for the midpoint_upsample TPU fault.

Loads the exact (points, mask) saved by probe_resample_crash.py and
repeatedly invokes midpoint_upsample variants to localize the faulting
construct. Each trial is one dispatch; fault probability is ~50% per
invocation on the crashing data, so run N repeats per variant.

Usage: python scripts/probe_upsample_crash.py [--variant base] [--reps 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--variant", default="base",
                    choices=["base", "knn_only", "one_round", "dense_mask",
                             "small_cap"])
    ap.add_argument("--reps", type=int, default=6)
    ap.add_argument("--input", default="/tmp/upsample_input.npz")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp
    import numpy as np

    from isopoints_tpu.ops.neighbors import knn_gather, knn_points
    from isopoints_tpu.ops.points import midpoint_upsample

    d = np.load(args.input)
    points = jnp.asarray(d["points"])
    mask = jnp.asarray(d["mask"])
    n = int(d["n"])
    print(f"[up] input {points.shape} valid={int(mask.sum())} n={n}",
          flush=True)

    def run(i):
        if args.variant == "base":
            out = midpoint_upsample(points, mask, n, neighborhood_size=16)
        elif args.variant == "small_cap":
            out = midpoint_upsample(points, mask, 1024, neighborhood_size=16)
        elif args.variant == "knn_only":
            out = knn_points(points, points, mask, mask, k=16,
                             exclude_self=True)
        elif args.variant == "one_round":
            res = knn_points(points, points, mask, mask, k=16,
                             exclude_self=True)
            nn = knn_gather(points, res.idx)
            mid = (nn + 2.0 * points[:, :, None, :]) / 3.0
            diff = mid[:, :, :, None, :] - nn[:, :, None, :, :]
            dd = jnp.linalg.norm(diff, axis=-1)
            dd = jnp.where(res.mask[:, :, None, :], dd, jnp.inf)
            clearance = jnp.min(dd, axis=-1)
            clearance = jnp.where(res.mask, clearance, -jnp.inf)
            out = jax.lax.top_k(jnp.max(clearance, axis=-1), 750)
        elif args.variant == "dense_mask":
            out = midpoint_upsample(points, jnp.ones_like(mask), n,
                                    neighborhood_size=16)
        t0 = time.time()
        jax.block_until_ready(out)
        print(f"[up] rep {i} variant={args.variant}: OK "
              f"(+{time.time() - t0:.1f}s)", flush=True)

    for i in range(args.reps):
        run(i)
    print("[up] ALL OK", flush=True)


if __name__ == "__main__":
    main()
