#!/usr/bin/env python
"""Generate a synthetic MVR dataset directory.

Parity: reference scripts/create_mvr_data_from_mesh.py (renders a mesh
into the MVRDataset layout). TPU-native: ray-traces an analytic SDF
with the framework's own ray engine (no mesh/pytorch3d dependency);
for mesh input, fits nothing — meshes can be converted by sampling +
`train_dtu_points.py` instead.

Usage: python scripts/create_mvr_data.py sphere out/data_sphere --n-views 24
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("shape", choices=["sphere", "torus", "box"])
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--n-views", type=int, default=24)
    parser.add_argument("--image-size", type=int, default=128)
    parser.add_argument("--camera-distance", type=float, default=2.0)
    parser.add_argument("--focal-length", type=float, default=2.0)
    parser.add_argument("--seed", type=int, default=0)
    args = parser.parse_args()

    from isopoints_tpu.data import synthetic
    from isopoints_tpu.logger import get_logger

    sdf_fn = {"sphere": synthetic.sphere_sdf,
              "torus": synthetic.torus_sdf,
              "box": synthetic.box_sdf}[args.shape]()
    data = synthetic.make_synthetic_mvr(
        sdf_fn, n_views=args.n_views, image_size=args.image_size,
        dist=args.camera_distance, focal=args.focal_length, seed=args.seed)
    synthetic.export_mvr_dataset(data, args.out_dir)
    get_logger().info("wrote %d views to %s", args.n_views, args.out_dir)


if __name__ == "__main__":
    main()
