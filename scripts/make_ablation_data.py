#!/usr/bin/env python
"""Build the reference-protocol ablation dataset: a non-trivial
compound mesh rendered into a 512px MVR dataset.

The reference's headline MVR experiment trains on a 512px multiview
rendering of a mechanical "compressor" part (README.md:60-67; the
data.zip is not available in this environment). The stand-in is a
compound CSG solid with the same qualitative difficulty — concavities,
a through-hole, thin features — meshed from its analytic SDF with the
framework's own marching tetrahedra, then rendered with the exact
Möller–Trumbore ray-caster (ops/raymesh.py) through the framework's
camera/lighting stack into the MVRDataset layout (incl. GT mesh +
area-weighted surface samples for chamfer evaluation).

  python scripts/make_ablation_data.py out/data_compound \
      --image-size 512 --n-views 24 --mesh-resolution 128
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def compound_sdf():
    """Torus ∪ axle box ∪ two side spheres, minus a vertical bore:
    a through-hole, concave junctions and thin features."""
    import jax.numpy as jnp

    def f(x):
        # main ring (in the xy plane)
        q = jnp.stack([jnp.linalg.norm(x[..., :2], axis=-1) - 0.55,
                       x[..., 2]], -1)
        torus = jnp.linalg.norm(q, axis=-1) - 0.16
        # axle: a box through the ring along x
        qb = jnp.abs(x - jnp.array([0.0, 0.0, 0.0])) \
            - jnp.array([0.68, 0.12, 0.12])
        box = (jnp.linalg.norm(jnp.maximum(qb, 0.0), axis=-1)
               + jnp.minimum(jnp.max(qb, axis=-1), 0.0))
        # end caps
        s1 = jnp.linalg.norm(x - jnp.array([0.68, 0.0, 0.0]),
                             axis=-1) - 0.2
        s2 = jnp.linalg.norm(x + jnp.array([0.68, 0.0, 0.0]),
                             axis=-1) - 0.2
        solid = jnp.minimum(jnp.minimum(torus, box),
                            jnp.minimum(s1, s2))
        # vertical bore through the axle (subtract a z-cylinder)
        cyl = jnp.linalg.norm(x[..., :2], axis=-1) - 0.09
        return jnp.maximum(solid, -cyl)

    return f


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("out_dir", type=str)
    ap.add_argument("--image-size", type=int, default=512)
    ap.add_argument("--n-views", type=int, default=24)
    ap.add_argument("--mesh-resolution", type=int, default=128)
    ap.add_argument("--n-gt-points", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from isopoints_tpu.data import synthetic
    from isopoints_tpu.logger import get_logger
    from isopoints_tpu.utils.io import save_ply
    from isopoints_tpu.utils.meshing import extract_mesh, largest_component

    log = get_logger()
    verts, faces = extract_mesh(compound_sdf(), args.mesh_resolution,
                                bbox_min=(-1.0,) * 3, bbox_max=(1.0,) * 3)
    verts, faces = largest_component(verts, faces)
    log.info("compound mesh: %d verts, %d faces", len(verts), len(faces))

    data = synthetic.make_mesh_mvr(
        verts, faces, n_views=args.n_views, image_size=args.image_size,
        seed=args.seed, norm_radius=0.7, n_gt_points=args.n_gt_points)
    synthetic.export_mvr_dataset(data, args.out_dir)
    save_ply(os.path.join(args.out_dir, "mesh_source.ply"),
             np.asarray(verts), faces=np.asarray(faces))
    log.info("wrote %d views @ %dpx to %s", args.n_views,
             args.image_size, args.out_dir)


if __name__ == "__main__":
    main()
