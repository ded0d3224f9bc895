#!/usr/bin/env python
"""Weak-scaling efficiency of the sharded train step.

Green-field per BASELINE.md ("≥80% rays/s multi-host scaling
efficiency" — the reference has no distributed layer, SURVEY.md §2.3).
Measures steps/s of `parallel.sharding.make_train_step` at mesh sizes
1..N with the PER-DEVICE ray budget held fixed (weak scaling), and
reports

    efficiency(N) = total_rays_per_s(N) / (N * total_rays_per_s(1))

One JSON line per mesh size on stdout. On a real TPU slice this
measures ICI collective overhead; on the virtual CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=N) devices share
host cores, so the numbers characterize dispatch/collective overhead
only — the output is labeled with the backend so the two regimes are
never conflated.

Usage:
  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/measure_scaling.py --rays-per-device 1024
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

_early = argparse.ArgumentParser(add_help=False)
_early.add_argument("--cpu-devices", type=int, default=0)
_eargs, _ = _early.parse_known_args()
if _eargs.cpu_devices:
    # the axon sitecustomize overrides JAX_PLATFORMS, so force the
    # virtual CPU mesh via XLA flags + jax.config (same trick as
    # tests/conftest.py)
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags +
            f" --xla_force_host_platform_device_count={_eargs.cpu_devices}"
        ).strip()

import jax
import jax.numpy as jnp
import optax

if _eargs.cpu_devices:
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")


def build(image_size=64):
    from isopoints_tpu.core.camera import (
        PerspectiveCamera,
        look_at_view_transform,
    )
    from isopoints_tpu.models.combined import CombinedConfig, CombinedModel
    from isopoints_tpu.models.fields import SirenField
    from isopoints_tpu.models.implicit import ImplicitConfig
    from isopoints_tpu.rendering.rasterizer import RasterizationSettings

    model = CombinedModel(
        SirenField(hidden_size=256, n_layers=3),
        cfg=ImplicitConfig(proj_max_iters=5),
        combined_cfg=CombinedConfig(max_iso_per_batch=512,
                                    n_points_per_cloud=1024,
                                    visibility_image_size=image_size),
        raster_settings=RasterizationSettings(
            image_size=image_size, tile_size=16, max_points_per_tile=128))
    params = model.init(jax.random.key(0))
    R, T = look_at_view_transform([2.0], [10.0], [0.0])
    camera = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
    img = jnp.ones((1, image_size, image_size, 3)) * 0.5
    mask_img = jnp.ones((1, image_size, image_size, 1))
    return model, params, camera, img, mask_img


def measure(n_dev, rays_per_device, n_iters, model, params, camera, img,
            mask_img):
    from isopoints_tpu.parallel.sharding import make_mesh, make_train_step

    mesh = make_mesh(n_dev)
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    points, points_mask = model.init_points(jax.random.key(1))
    n_rays = rays_per_device * n_dev
    step = make_train_step(model, optimizer, mesh, project=True,
                           n_rays=n_rays, image_size=img.shape[1:3],
                           n_eikonal_points=256 * n_dev)
    hp = {k: jnp.asarray(v) for k, v in
          [("lambda_rgb", 1.0), ("lambda_freespace", 1.0),
           ("lambda_occupied", 1.0), ("lambda_eikonal", 0.01),
           ("sdf_alpha", 10.0)]}
    args = (params, opt_state, points, points_mask, None, img, mask_img,
            camera, hp)
    out = step(*args, jax.random.key(2))
    jax.block_until_ready(out)
    times = []
    for i in range(n_iters):
        t0 = time.perf_counter()
        out = step(*args, jax.random.key(3 + i))
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    return n_rays / dt, dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu-devices", type=int, default=0,
                    help="force an N-device virtual CPU mesh")
    ap.add_argument("--rays-per-device", type=int, default=2048)
    ap.add_argument("--total-rays", type=int, default=0,
                    help="constant-total-work mode: hold the TOTAL ray "
                         "budget fixed across mesh sizes. On a virtual "
                         "CPU mesh (devices share host cores) weak "
                         "scaling is compute-contended and meaningless; "
                         "with constant total work a perfect sharded "
                         "program matches the 1-device wall time, so "
                         "t(1)/t(N) isolates partition+collective "
                         "overhead — the honest virtual-mesh signal.")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--mesh-sizes", type=int, nargs="*", default=None)
    ap.add_argument("--image-size", type=int, default=64,
                    help="view/visibility resolution of the measured "
                         "step (64 = SCALING.md default; 128 = bench "
                         "geometry)")
    args = ap.parse_args()

    n_avail = jax.device_count()
    sizes = args.mesh_sizes or sorted(
        {n for n in (1, 2, 4, 8, n_avail) if n <= n_avail})
    setup = build(image_size=args.image_size)
    base = None
    for n in sizes:
        per_dev = (args.total_rays // n if args.total_rays
                   else args.rays_per_device)
        rays_per_s, dt = measure(n, per_dev, args.iters, *setup)
        if n == 1:
            base = rays_per_s
        if args.total_rays:
            # constant total work: perfect = same throughput as 1 device
            eff = rays_per_s / base if base else float("nan")
            key = "partition_overhead_efficiency"
        else:
            eff = rays_per_s / (n * base) if base else float("nan")
            key = "weak_scaling_efficiency"
        print(json.dumps({
            "backend": jax.default_backend(),
            "n_devices": n,
            "rays_per_device": per_dev,
            "total_rays_per_s": round(rays_per_s, 1),
            "step_ms": round(dt * 1e3, 2),
            key: round(eff, 4),
        }))


if __name__ == "__main__":
    main()
