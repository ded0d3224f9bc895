#!/usr/bin/env python
"""Point-cloud surface reconstruction entry (DTU workload).

Parity: reference test_dtu_points.py (despite the name, a workload
entry — SURVEY.md §3.4): fit a SIREN/IGR SDF to a noisy point cloud
with periodic iso-point extraction, bilateral reweighting, and a final
high-res mesh.

Usage:
  python train_dtu_points.py scan.ply --out-dir out/scan
  python train_dtu_points.py synthetic:sphere --total-iters 500
"""

import argparse
import os

import numpy as np


def load_cloud(spec: str, n_noise: float, n_points: int, seed: int):
    """Load a .ply or generate a synthetic noisy cloud
    ('synthetic:sphere|torus|box')."""
    if spec.startswith("synthetic:"):
        import jax
        import jax.numpy as jnp

        from isopoints_tpu.data import synthetic
        from isopoints_tpu.models.levelset import project_points_newton

        name = spec.split(":", 1)[1]
        sdf_fn = {"sphere": synthetic.sphere_sdf,
                  "torus": synthetic.torus_sdf,
                  "box": synthetic.box_sdf}[name]()
        # n_points == 0 means "keep the full cloud" for .ply input; a
        # synthetic cloud has no inherent size — default to 20k
        n_points = n_points or 20000
        rng = np.random.RandomState(seed)
        init = jnp.asarray(rng.uniform(-0.8, 0.8, (1, n_points, 3)), jnp.float32)
        proj = project_points_newton(sdf_fn, init,
                                     jnp.ones((1, n_points), bool),
                                     max_iters=30, tolerance=1e-5)
        pts = np.asarray(proj.points[0])[np.asarray(proj.mask[0])]
        pts = pts + rng.normal(scale=n_noise, size=pts.shape)
        return pts.astype(np.float32), None
    from isopoints_tpu.utils.io import read_ply

    data = read_ply(spec)
    pts = data["points"].astype(np.float32)
    normals = data.get("normals")
    if n_points > 0 and len(pts) > n_points:
        idx = np.random.RandomState(seed).choice(len(pts), n_points,
                                                 replace=False)
        pts = pts[idx]
        normals = None if normals is None else normals[idx].astype(np.float32)
    return pts, normals


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pointcloud", type=str,
                        help=".ply path or synthetic:{sphere,torus,box}")
    parser.add_argument("--out-dir", type=str, default="out/dtu_points")
    parser.add_argument("--decoder-type", choices=["siren", "sdf"],
                        default="siren")
    parser.add_argument("--total-iters", type=int, default=2000)
    parser.add_argument("--warm-up", type=int, default=200)
    parser.add_argument("--resample-every", type=int, default=500)
    parser.add_argument("--n-points", type=int, default=0,
                        help="optional random subsample; 0 = keep the "
                             "full cloud (grid FRNN scales to raw "
                             "DTU-scan size)")
    parser.add_argument("--n-iso-points", type=int, default=4000)
    parser.add_argument("--batch-size", type=int, default=5000)
    parser.add_argument("--weight-mode", type=int, default=1,
                        help="-1 off, 1 bilateral, 2 laplacian, 3 heat-kernel")
    parser.add_argument("--ear", action="store_true",
                        help="edge-aware iso-point projection")
    parser.add_argument("--use-off-normal-loss", action="store_true")
    parser.add_argument("--mesh-resolution", type=int, default=256)
    parser.add_argument("--noise", type=float, default=0.02,
                        help="synthetic cloud noise sigma")
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from isopoints_tpu.core.cloud import PointCloud
    from isopoints_tpu.logger import get_logger
    from isopoints_tpu.workloads.dtu_points import DTUPointsConfig, fit_point_cloud

    log = get_logger()
    os.makedirs(args.out_dir, exist_ok=True)
    pts, normals = load_cloud(args.pointcloud, args.noise, args.n_points,
                              args.seed)
    log.info("loaded %d points from %s", len(pts), args.pointcloud)

    # normalize to ~[-0.75, 0.75]^3 (test_dtu_points.py:182-191)
    pc = PointCloud.create(points=pts[None])
    pc, center, scale = pc.normalize_to_box(side=1.5)
    pts_n = np.asarray(pc.points[0])
    log.info("normalized: center=%s scale=%.4f",
             np.asarray(center).ravel(), float(np.asarray(scale).ravel()[0]))

    cfg = DTUPointsConfig(
        decoder_type=args.decoder_type, total_iters=args.total_iters,
        warm_up=args.warm_up, resample_every=args.resample_every,
        n_iso_points=args.n_iso_points, batch_size=min(args.batch_size, len(pts_n)),
        weight_mode=args.weight_mode, ear=args.ear,
        use_off_normal_loss=args.use_off_normal_loss,
        mesh_resolution=args.mesh_resolution)
    params, decoder, info = fit_point_cloud(
        pts_n, normals, cfg, seed=args.seed, out_dir=args.out_dir,
        denormalize=(np.asarray(center).ravel(),
                     float(np.asarray(scale).ravel()[0])))
    log.info("finished; outputs in %s", args.out_dir)


if __name__ == "__main__":
    main()
