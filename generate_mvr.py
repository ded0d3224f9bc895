#!/usr/bin/env python
"""Mesh + image generation from a trained MVR checkpoint.

Parity: reference generate_mvr.py — load config+checkpoint, high-res
marching cubes, iso-contour html, per-view ray-traced RGBA renders.

Usage: python generate_mvr.py configs/synthetic_sphere_iso.yml \
           --checkpoint out/synthetic_sphere_iso/model.npz
"""

import argparse
import os

import numpy as np


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--out-dir", type=str, default=None)
    parser.add_argument("--mesh-resolution", type=int, default=256)
    parser.add_argument("--image-size", type=int, default=256)
    parser.add_argument("--n-views", type=int, default=4)
    parser.add_argument("--iso-contours", action="store_true")
    args = parser.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

    from isopoints_tpu.config import default_config_path, load_config
    from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
    from isopoints_tpu.factories import create_model
    from isopoints_tpu.logger import get_logger
    from isopoints_tpu.misc.checkpoints import CheckpointIO
    from isopoints_tpu.models.generator import Generator, GeneratorConfig
    from isopoints_tpu.utils.io import save_image, save_ply

    log = get_logger()
    cfg = load_config(args.config, default_config_path())
    run_name = os.path.splitext(os.path.basename(args.config))[0]
    out_dir = args.out_dir or os.path.join("out", run_name, "generation")
    os.makedirs(out_dir, exist_ok=True)

    model = create_model(cfg)
    params = model.init(jax.random.key(0))
    ckpt_path = args.checkpoint or os.path.join("out", run_name, "model.npz")
    ckpt = CheckpointIO(os.path.dirname(ckpt_path), model=params)
    scalars = ckpt.load(os.path.basename(ckpt_path))
    params = ckpt.registry["model"]
    log.info("loaded checkpoint (it=%s)", scalars.get("it"))

    gen = Generator(model, GeneratorConfig(
        mesh_resolution=args.mesh_resolution, image_size=args.image_size))

    verts, faces = gen.generate_mesh(params)
    if str(cfg.data.get("type", "")).upper() == "DTU":
        # the model is trained in scale_mat-normalized coordinates;
        # emit the mesh in the scan's original world frame so chamfer/
        # point-face metrics compare against the unnormalized GT
        # (reference generate_mvr.py:76-78)
        from isopoints_tpu.data.dataset import DTUDataset

        sm = DTUDataset(cfg.data.data_dir).get_scale_mat()
        verts = verts @ sm[:3, :3].T + sm[:3, 3]
        log.info("applied DTU scale_mat denormalization")
        # marker so evaluate.py --scale-mat-from doesn't re-apply the
        # transform to a mesh already in world coordinates
        with open(os.path.join(out_dir, "mesh.ply.denormalized"), "w") as f:
            f.write("scale_mat applied by generate_mvr.py\n")
    save_ply(os.path.join(out_dir, "mesh.ply"), verts, faces=faces)
    log.info("mesh: %d verts %d faces -> %s/mesh.ply",
             len(verts), len(faces), out_dir)

    if args.iso_contours:
        gen.generate_iso_contour(params, os.path.join(out_dir, "iso_contour.html"))
        log.info("iso contours -> %s/iso_contour.html", out_dir)

    dists = [cfg.data.get("camera_distance", 2.0)] * args.n_views
    azims = np.linspace(0, 360, args.n_views, endpoint=False)
    R, T = look_at_view_transform(dists, [15.0] * args.n_views, azims)
    camera = PerspectiveCamera.create(
        R=R, T=T, focal_length=cfg.data.get("focal_length", 2.0))
    rgba = gen.raytrace_images(params, camera)
    for i in range(args.n_views):
        save_image(os.path.join(out_dir, f"view_{i:03d}.png"), rgba[i])
    log.info("%d ray-traced views -> %s", args.n_views, out_dir)


if __name__ == "__main__":
    main()
