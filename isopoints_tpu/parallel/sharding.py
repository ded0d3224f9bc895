"""Multi-chip scaling: mesh construction + THE training step.

The reference is single-GPU with no distributed layer (SURVEY.md §2.3)
— this module is the green-field TPU-native scaling design mandated by
BASELINE.json: rays and eikonal samples sharded over the `data` mesh
axis (DP/SP), iso-points replicated (≤24k points — cheaper to
replicate than halo-exchange neighbor searches), SDF-MLP parameters
replicated with gradients `psum` over ICI inside the backward
(`shard_map` + XLA collectives; the compiler overlaps the all-reduce
with the remaining backward work).

`make_train_step` is the ONLY step implementation: `MVRTrainer` builds
through it on a 1-device mesh by default, and `train_mvr.py
--n-devices N` scales it out — there is no separate single-chip code
path to drift. Determinism contract: every random draw is taken
full-width from the replicated key and sliced per shard, and loss
terms are normalized per segment (see `compute_loss`), so mesh(N)
reproduces mesh(1) exactly up to float reduction order
(tests/test_parallel.py asserts this).

Scaling recipe (jax-ml scaling-book style): pick the mesh, annotate
in/out specs, let XLA insert collectives; rays/s efficiency is
measured by `bench.py` at 1 chip and on the virtual multi-device mesh
by `__graft_entry__.dryrun_multichip`.
"""

import math
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from isopoints_tpu.models.combined import CombinedModel
from isopoints_tpu.ops.images import sample_random_pixels


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the data (ray) axis.

    `n_devices`: None or 0 = ALL global devices (multi-host: every
    device of every process, jax.devices() after
    jax.distributed.initialize()); N > 0 = the first N."""
    devices = jax.devices()
    if n_devices:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_train_step(model: CombinedModel,
                    optimizer: optax.GradientTransformation,
                    mesh: Mesh, project: bool,
                    n_rays: int, image_size: Tuple[int, int],
                    n_eikonal_points: int = 1024,
                    views_sharded: bool = False):
    """Build THE jitted training step over `mesh` (1-device = single chip).

    Sharding layout:
      * rays: `n_rays` pixels sampled full-width inside the step from
        the replicated key; each chip traces its n_rays/n_dev slice
        (the hot loop).
      * images / cameras / iso-points / params: replicated.
      * loss + grads: per-shard partial losses normalized so
        `pmean` (over ICI) reconstructs the global loss/gradient, then
        a replicated optimizer update (identical on every chip).

    Returns step(params, opt_state, points, points_mask, spacing, img,
    mask_img, camera, hp, key) -> (params, opt_state, new_points,
    new_mask, metrics, saliency). `spacing` is the cached splat kNN
    spacing for `points` (None = the forward computes it fresh; the
    trainer refreshes it on the resample cadence). `saliency` is the
    (points, rgb_residual, mask) triple for loss-weighted resampling
    (replicated; meaningful only with project=True).
    """
    from isopoints_tpu.training.trainer import compute_loss

    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size
    n_local = -(-n_rays // n_dev)          # ceil: round the ray budget up
    n_eik = -(-n_eikonal_points // n_dev) * n_dev

    def shard_body(params, opt_state, points, points_mask, spacing, img,
                   mask_img, camera, hp, key):
        i = jax.lax.axis_index(axis)
        if views_sharded:
            # multi-host input mode (parallel/data.py): each host ships
            # only its view shard over PCIe/DCN; replicate on-device
            # over ICI, then proceed identically to the replicated path
            img = jax.lax.all_gather(img, axis, axis=0, tiled=True)
            mask_img = jax.lax.all_gather(mask_img, axis, axis=0,
                                          tiled=True)
            camera = jax.tree.map(
                lambda x: jax.lax.all_gather(x, axis, axis=0, tiled=True),
                camera)
        k_pix, k_loss = jax.random.split(key)
        # full-width replicated pixel sample, local slice
        pix_full = sample_random_pixels(k_pix, n_local * n_dev, image_size,
                                        batch_size=img.shape[0])
        pixels = jax.lax.dynamic_slice_in_dim(pix_full, i * n_local,
                                              n_local, axis=1)

        def local_loss(params):
            return compute_loss(model, params, points, points_mask, pixels,
                                img, mask_img, camera, k_loss, hp, project,
                                n_eikonal_points=n_eik, n_dev=n_dev,
                                axis_name=axis, spacing=spacing)

        (loss, (metrics, new_pts, new_mask, saliency)), grads = \
            jax.value_and_grad(local_loss, has_aux=True)(params)
        # ICI all-reduce; XLA overlaps with the remaining backward
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.tree.map(
            lambda v: jax.lax.pmean(v.astype(jnp.float32), axis), metrics)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        if project:
            # iso pipeline is shard-deterministic -> replicated outputs
            return params, opt_state, new_pts, new_mask, metrics, saliency
        # warm-up: iso buffers pass through unchanged; per-ray saliency
        # is unused (replicated dummies keep the out_specs uniform)
        zero3 = jnp.zeros((1, 1, 3), jnp.float32)
        zero1 = jnp.zeros((1, 1), jnp.float32)
        return (params, opt_state, points, points_mask, metrics,
                (zero3, zero1, zero1 > 0))

    rep = P()
    if views_sharded:
        shd = P(axis)
        in_specs = (rep, rep, rep, rep, rep, shd, shd, shd, rep, rep)
    else:
        in_specs = (rep,) * 10
    out_specs = (rep, rep, rep, rep, rep, (rep, rep, rep))
    sharded = shard_map(shard_body, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)
    return jax.jit(sharded)


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated on every mesh device."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
