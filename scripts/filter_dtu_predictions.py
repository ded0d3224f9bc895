#!/usr/bin/env python
"""Mask-filter a DTU MVS point cloud by multi-view silhouette agreement.

Parity: reference scripts/filter_dtu_predictions.py (uses im2mesh +
open3d) — here with the framework's own DTU cameras and NDC image
sampling: a point survives if it projects inside the 2D mask in at
least `--min-views` of the views where it is in front of the camera.

Usage: python scripts/filter_dtu_predictions.py scan.ply dtu_dir out.ply
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("pointcloud", type=str)
    parser.add_argument("dtu_dir", type=str,
                        help="DTU directory with image/ mask/ cameras.npz")
    parser.add_argument("out", type=str)
    parser.add_argument("--min-views", type=int, default=None,
                        help="default: all views with the point in front")
    parser.add_argument("--chunk", type=int, default=200000)
    args = parser.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from isopoints_tpu.data.dataset import DTUDataset
    from isopoints_tpu.logger import get_logger
    from isopoints_tpu.ops.images import sample_image_at_ndc
    from isopoints_tpu.utils.io import read_ply, save_ply

    log = get_logger()
    data = read_ply(args.pointcloud)
    pts = np.asarray(data["points"], np.float32)
    ds = DTUDataset(args.dtu_dir)
    n_views = len(ds)
    image_size = ds[0]["img.mask"].shape[:2]

    votes = np.zeros(len(pts), np.int32)
    front = np.zeros(len(pts), np.int32)
    for v in range(n_views):
        cam = ds.camera([v], image_size)
        mask_img = jnp.asarray(ds[v]["img.mask"])[None]
        for i in range(0, len(pts), args.chunk):
            p = jnp.asarray(pts[i:i + args.chunk])[None]
            ndc = cam.project_ndc(p)
            z_ok = np.asarray(ndc[0, :, 2]) > 0
            in_img = np.all(np.abs(np.asarray(ndc[0, :, :2])) <= 1.0, axis=-1)
            inm = np.asarray(sample_image_at_ndc(
                mask_img, ndc[..., :2], mode="nearest")[0, :, 0]) > 0.5
            sl = slice(i, i + len(z_ok))
            front[sl] += (z_ok & in_img).astype(np.int32)
            votes[sl] += (z_ok & in_img & inm).astype(np.int32)
        log.info("view %d/%d", v + 1, n_views)

    need = front if args.min_views is None else np.minimum(front, args.min_views)
    keep = (front > 0) & (votes >= need)
    log.info("kept %d/%d points", int(keep.sum()), len(pts))
    save_ply(args.out, pts[keep],
             normals=None if data.get("normals") is None
             else np.asarray(data["normals"])[keep])


if __name__ == "__main__":
    main()
