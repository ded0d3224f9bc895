"""Multi-chip scaling: mesh construction + sharded training steps.

The reference is single-GPU with no distributed layer (SURVEY.md §2.3)
— this module is the green-field TPU-native scaling design mandated by
BASELINE.json: rays and eikonal samples sharded over the `data` mesh
axis (DP/SP), iso-points replicated (≤24k points — cheaper to
replicate than halo-exchange neighbor searches), SDF-MLP parameters
replicated with gradients `psum` over ICI inside the backward
(`shard_map` + XLA collectives; the compiler overlaps the all-reduce
with the remaining backward work).

Scaling recipe (jax-ml scaling-book style): pick the mesh, annotate
in/out specs, let XLA insert collectives; rays/s efficiency is
measured by `bench.py` at 1 chip and on the virtual multi-device mesh
by `__graft_entry__.dryrun_multichip`.
"""

from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from isopoints_tpu.models.combined import CombinedModel
from isopoints_tpu.training.trainer import compute_loss


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the data (ray) axis."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def make_sharded_train_step(model: CombinedModel,
                            optimizer: optax.GradientTransformation,
                            mesh: Mesh, project: bool = True,
                            n_eikonal_points: int = 1024):
    """Build a jitted multi-chip training step.

    Sharding layout:
      * `ndc_pixels` (B, N, 2): N sharded over the mesh axis — each
        chip traces N/n_dev rays (the hot loop).
      * images / cameras / iso-points / params: replicated.
      * loss + grads: per-shard sums `psum`ed over ICI, then a
        replicated optimizer update (identical on every chip).

    Returns step(params, opt_state, points, points_mask, img, mask_img,
    camR, camT, fl, pp, hp, key) -> (params, opt_state, new_points,
    new_mask, metrics).
    """
    axis = mesh.axis_names[0]
    n_dev = mesh.devices.size

    def local_loss(params, points, points_mask, pixels, img, mask_img,
                   camR, camT, fl, pp, hp, key):
        from isopoints_tpu.core.camera import PerspectiveCamera

        camera = PerspectiveCamera(R=camR, T=camT, focal_length=fl,
                                   principal_point=pp)
        # The iso-point pipeline (visible projection -> new_pts) must be
        # DETERMINISTIC across shards (its inputs — points, camera, key —
        # are all replicated), so the main key stays UNFOLDED; only the
        # eikonal sampling, which SHOULD differ per shard, gets an
        # axis-folded key.
        k_eik = jax.random.fold_in(key, jax.lax.axis_index(axis))
        loss, (metrics, new_pts, new_mask, _saliency) = compute_loss(
            model, params, points, points_mask, pixels, img, mask_img,
            camera, key, hp, project,
            n_eikonal_points=max(n_eikonal_points // n_dev, 1),
            eikonal_key=k_eik)
        return loss, (metrics, new_pts, new_mask)

    def shard_body(params, opt_state, points, points_mask, pixels, img,
                   mask_img, camR, camT, fl, pp, hp, key):
        (loss, (metrics, new_pts, new_mask)), grads = jax.value_and_grad(
            local_loss, has_aux=True)(params, points, points_mask, pixels,
                                      img, mask_img, camR, camT, fl, pp,
                                      hp, key)
        # ICI all-reduce; XLA overlaps with the remaining backward
        grads = jax.lax.pmean(grads, axis)
        metrics = jax.tree.map(lambda v: jax.lax.pmean(
            v.astype(jnp.float32), axis), metrics)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, new_pts, new_mask, metrics

    rep = P()
    pix_spec = P(None, axis)          # shard the ray axis
    in_specs = (rep, rep, rep, rep, pix_spec, rep, rep, rep, rep, rep,
                rep, rep, rep)
    # new_pts/new_mask come from the replicated iso pipeline
    out_specs = (rep, rep, rep, rep, rep)

    sharded = shard_map(shard_body, mesh=mesh, in_specs=in_specs,
                        out_specs=out_specs, check_vma=False)
    return jax.jit(sharded)


def replicate(tree, mesh: Mesh):
    """Place a pytree replicated on every mesh device."""
    sharding = jax.sharding.NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_rays(pixels: jax.Array, mesh: Mesh) -> jax.Array:
    """Place (B, N, 2) pixels with N sharded over the mesh axis."""
    sharding = jax.sharding.NamedSharding(mesh, P(None, mesh.axis_names[0]))
    return jax.device_put(pixels, sharding)
