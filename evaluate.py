#!/usr/bin/env python
"""Mesh quality evaluation entry.

Parity: reference evaluation.py — per experiment dir: GT points
(sampled once and cached) vs each generated mesh's 50k samples →
chamfer-p / chamfer-n / point-face distance → CSV.

Usage:
  python evaluate.py out/run --gt-mesh gt.ply
  python evaluate.py out/run --gt-sdf sphere      # analytic GT (CI)
"""

import argparse
import csv
import glob
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("exp_dir", type=str)
    parser.add_argument("--gt-mesh", type=str, default=None,
                        help="GT mesh .ply (sampled to 50k points)")
    parser.add_argument("--gt-points", type=str, default=None,
                        help="GT point cloud .ply")
    parser.add_argument("--gt-sdf", type=str, default=None,
                        choices=["sphere", "torus", "box"],
                        help="analytic GT surface (synthetic runs)")
    parser.add_argument("--n-samples", type=int, default=50000)
    parser.add_argument("--scale-mat-from", type=str, default=None,
                        metavar="DATA_DIR",
                        help="DTU data dir: apply its scale_mat_0 "
                             "(normalized->world) to every evaluated "
                             "mesh so metrics are computed in world "
                             "coordinates (for meshes saved in "
                             "normalized training coordinates; "
                             "generation/mesh.ply from generate_mvr.py "
                             "is already denormalized)")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")

    from isopoints_tpu.logger import get_logger
    from isopoints_tpu.training.evaluation import evaluate_mesh
    from isopoints_tpu.utils.io import read_ply
    from isopoints_tpu.utils.meshing import sample_points_from_mesh

    log = get_logger()
    # cache keyed by GT source so switching --gt-* never reuses stale
    # samples; normals cached alongside
    src_tag = ("mesh" if args.gt_mesh else
               "points" if args.gt_points else args.gt_sdf or "none")
    cache = os.path.join(args.exp_dir,
                         f"val{args.n_samples}_{src_tag}.npz")
    gt_normals = None
    if os.path.exists(cache):
        with np.load(cache) as d:
            gt_points = d["points"]
            gt_normals = d["normals"] if "normals" in d else None
    elif args.gt_points:
        data = read_ply(args.gt_points)
        gt_points = data["points"][:args.n_samples]
        gt_normals = data.get("normals")
        if gt_normals is not None:
            gt_normals = gt_normals[:args.n_samples]
    elif args.gt_mesh:
        data = read_ply(args.gt_mesh)
        gt_points, gt_normals = sample_points_from_mesh(
            data["points"], data["faces"], args.n_samples)
        np.savez(cache, points=gt_points, normals=gt_normals)
    elif args.gt_sdf:
        import jax.numpy as jnp

        from isopoints_tpu.data import synthetic
        from isopoints_tpu.models.levelset import project_points_newton

        sdf_fn = {"sphere": synthetic.sphere_sdf,
                  "torus": synthetic.torus_sdf,
                  "box": synthetic.box_sdf}[args.gt_sdf]()
        rng = np.random.RandomState(0)
        init = jnp.asarray(rng.uniform(-0.8, 0.8, (1, args.n_samples, 3)),
                           jnp.float32)
        proj = project_points_newton(
            sdf_fn, init, jnp.ones((1, args.n_samples), bool),
            max_iters=30, tolerance=1e-5)
        gt_points = np.asarray(proj.points[0])[np.asarray(proj.mask[0])]
    else:
        parser.error("one of --gt-mesh/--gt-points/--gt-sdf is required")

    meshes = sorted(glob.glob(os.path.join(args.exp_dir, "**", "*.ply"),
                              recursive=True))
    meshes = [m for m in meshes if "mesh" in os.path.basename(m)
              or os.path.basename(m) == "final.ply"]
    if not meshes:
        log.warning("no meshes found under %s", args.exp_dir)
        return
    gt_verts = gt_faces = None
    if args.gt_mesh:
        gd = read_ply(args.gt_mesh)
        gt_verts, gt_faces = gd["points"], gd.get("faces")

    scale_mat = None
    if args.scale_mat_from:
        from isopoints_tpu.data.dataset import DTUDataset

        scale_mat = DTUDataset(args.scale_mat_from).get_scale_mat()
        log.info("denormalizing meshes with scale_mat from %s",
                 args.scale_mat_from)

    out_csv = os.path.join(args.exp_dir, "eval.csv")
    rows = []
    for m in meshes:
        data = read_ply(m)
        if "faces" not in data or data["faces"] is None:
            continue
        if scale_mat is not None:
            if os.path.exists(m + ".denormalized"):
                # generate_mvr.py already emitted this mesh in world
                # coordinates — applying scale_mat again would
                # double-transform it (advisor r3 finding)
                log.info("%s: already denormalized (marker present), "
                         "skipping scale_mat", os.path.relpath(m, args.exp_dir))
            else:
                data["points"] = (data["points"] @ scale_mat[:3, :3].T
                                  + scale_mat[:3, 3])
        metrics = evaluate_mesh(data["points"], data["faces"], gt_points,
                                gt_normals, gt_verts=gt_verts,
                                gt_faces=gt_faces, n_samples=args.n_samples)
        row = {"mesh": os.path.relpath(m, args.exp_dir), **metrics}
        rows.append(row)
        log.info("%s: %s", row["mesh"],
                 " ".join(f"{k}={v:.6g}" for k, v in metrics.items()))
    if not rows:
        log.warning("no evaluable meshes (missing faces?) under %s",
                    args.exp_dir)
        return
    with open(out_csv, "w", newline="") as f:
        writer = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        writer.writeheader()
        writer.writerows(rows)
    log.info("wrote %s", out_csv)


if __name__ == "__main__":
    main()
