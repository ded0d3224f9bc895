#!/usr/bin/env python
"""Point-cloud to point-cloud chamfer evaluation.

Parity: reference scripts/evaluatePointClouds.py (chamfer via the
external pytorch_points package) — here via the framework's own
matmul-blocked kNN.

Usage: python scripts/evaluate_pointclouds.py pred.ply gt.ply
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pred", type=str)
    parser.add_argument("gt", type=str)
    parser.add_argument("--max-points", type=int, default=50000)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from isopoints_tpu.training.evaluation import chamfer_distance
    from isopoints_tpu.utils.io import read_ply

    def load(path):
        d = read_ply(path)
        pts = d["points"]
        nrm = d.get("normals")
        if len(pts) > args.max_points:
            idx = np.random.RandomState(0).choice(len(pts), args.max_points,
                                                  replace=False)
            pts = pts[idx]
            nrm = None if nrm is None else nrm[idx]
        return pts, nrm

    p, pn = load(args.pred)
    g, gn = load(args.gt)
    m = chamfer_distance(jnp.asarray(p), jnp.asarray(g),
                         x_normals=None if pn is None else jnp.asarray(pn),
                         y_normals=None if gn is None else jnp.asarray(gn))
    for k, v in m.items():
        print(f"{k}: {v:.6g}")


if __name__ == "__main__":
    main()
