#!/usr/bin/env python
"""Generate an MVR dataset directory from an analytic SDF or a mesh.

Parity: reference scripts/create_mvr_data_from_mesh.py (renders a
PLY/OBJ mesh with pytorch3d into the MVRDataset layout). TPU-native:
analytic shapes are sphere-traced, meshes are ray-cast exactly
(ops/raymesh.py Möller–Trumbore) — both through the framework's own
camera/lighting engine. Mesh input also writes dense depth and the
normalized GT mesh + surface samples for evaluation.

Usage:
  python scripts/create_mvr_data.py sphere out/data_sphere --n-views 24
  python scripts/create_mvr_data.py mesh out/data_bunny --mesh bunny.ply
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("shape", choices=["sphere", "torus", "box", "mesh"])
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--mesh", type=str, default=None,
                        help="PLY/OBJ mesh path (shape=mesh)")
    parser.add_argument("--n-views", type=int, default=24)
    parser.add_argument("--image-size", type=int, default=128)
    parser.add_argument("--camera-distance", type=float, default=2.0)
    parser.add_argument("--focal-length", type=float, default=2.0)
    parser.add_argument("--norm-radius", type=float, default=0.7,
                        help="mesh normalization radius (unit-sphere "
                             "scale; <1 keeps it inside the tracer's "
                             "bounding sphere)")
    parser.add_argument("--n-gt-points", type=int, default=20000)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from isopoints_tpu.data import synthetic
    from isopoints_tpu.logger import get_logger

    if args.shape == "mesh":
        if not args.mesh:
            parser.error("shape=mesh requires --mesh PATH")
        from isopoints_tpu.utils.io import load_mesh

        mesh = load_mesh(args.mesh)
        data = synthetic.make_mesh_mvr(
            mesh["points"], mesh["faces"], n_views=args.n_views,
            image_size=args.image_size, dist=args.camera_distance,
            focal=args.focal_length, seed=args.seed,
            norm_radius=args.norm_radius, n_gt_points=args.n_gt_points)
    else:
        sdf_fn = {"sphere": synthetic.sphere_sdf,
                  "torus": synthetic.torus_sdf,
                  "box": synthetic.box_sdf}[args.shape]()
        data = synthetic.make_synthetic_mvr(
            sdf_fn, n_views=args.n_views, image_size=args.image_size,
            dist=args.camera_distance, focal=args.focal_length,
            seed=args.seed)
    synthetic.export_mvr_dataset(data, args.out_dir)
    get_logger().info("wrote %d views to %s", args.n_views, args.out_dir)


if __name__ == "__main__":
    main()
