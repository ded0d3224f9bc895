"""DVR-style occupancy scene model.

Parity: reference DSS/models/occupancy_modeling.py — an ONet-style
occupancy decoder with DVR ray marching (`DepthModule`/
`pixels_to_world`, :59-364). The reference version depends on the
non-vendored `im2mesh` package and is dead code (SURVEY.md §2.2);
this is a working TPU-native reconstruction of the capability: uniform
proposal sampling along cube-clipped rays, first out→in logit crossing
refined by secant (models/raytracing.py with `is_occupancy=True`),
freespace/occupancy BCE targets on logits, and mesh extraction at the
`tau` level set.
"""

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isopoints_tpu.core.camera import PerspectiveCamera
from isopoints_tpu.models.fields import OccupancyField
from isopoints_tpu.models.raytracing import (
    find_zero_crossing_between_point_pairs,
    intersection_with_unit_cube,
)
from isopoints_tpu.ops.images import sample_image_at_ndc


class OccupancyOutput(NamedTuple):
    surface_points: jax.Array   # (B, N, 3) first crossings
    surface_mask: jax.Array     # (B, N) valid crossing & in gt mask
    network_mask: jax.Array     # (B, N) valid crossing (gt-independent)
    logits_freespace: jax.Array  # (B, N) logits at min-logit candidates
    freespace_mask: jax.Array
    logits_occupancy: jax.Array
    occupancy_mask: jax.Array


@dataclass(frozen=True)
class OccupancyConfig:
    object_bounding_sphere: float = 1.0
    n_steps: int = 100
    n_secant_steps: int = 8
    tau: float = 0.5  # occupancy decision threshold (logit space: logit(tau))


class OccupancyModel:
    """Occupancy decoder + DVR ray marching."""

    def __init__(self, decoder: Optional[OccupancyField] = None,
                 cfg: OccupancyConfig = OccupancyConfig()):
        self.decoder = decoder or OccupancyField()
        self.cfg = cfg
        import math
        self._tau_logit = math.log(cfg.tau / (1.0 - cfg.tau))

    def init(self, key: jax.Array) -> dict:
        return {"decoder": self.decoder.init(key)}

    def logits_fn(self, params):
        """Occupancy logits shifted by tau: >0 = inside.

        FieldOutput.occupancy carries RAW logits (fields._split_output
        only squashes rgb; tests/test_fields.py asserts this), so the
        shift applies directly — no sigmoid inversion.
        """
        def f(x):
            out = self.decoder.apply(params["decoder"], x)
            return out.occupancy[..., 0] - self._tau_logit
        return f

    def pixels_to_world(self, params, ndc_pixels: jax.Array,
                        camera: PerspectiveCamera,
                        rays: Optional[Tuple] = None
                        ) -> Tuple[jax.Array, jax.Array]:
        """First out→in crossing on each cube-clipped ray
        (occupancy_modeling.py:324-364 semantics). `rays` optionally
        carries precomputed (entry, exit, hit) so forward() doesn't
        redo the ray construction + cube intersection."""
        f = self.logits_fn(params)
        if rays is None:
            cam_pos = camera.camera_center()[:, None, :]
            _, dirs = camera.ndc_to_rays(ndc_pixels)
            entry, exit_, hit = intersection_with_unit_cube(
                cam_pos, dirs,
                side_length=self.cfg.object_bounding_sphere * 2)
        else:
            entry, exit_, hit = rays
        pts, mask = find_zero_crossing_between_point_pairs(
            f, entry, exit_, n_steps=self.cfg.n_steps,
            n_secant_steps=self.cfg.n_secant_steps, is_occupancy=True)
        return pts, mask & hit

    def forward(self, params, ndc_pixels: jax.Array, mask_img: jax.Array,
                camera: PerspectiveCamera, key: jax.Array) -> OccupancyOutput:
        """DVR forward: crossings + freespace/occupancy logit targets."""
        f = self.logits_fn(params)
        mask_gt = sample_image_at_ndc(mask_img, ndc_pixels,
                                      mode="nearest")[..., 0] > 0.5
        cam_pos = camera.camera_center()[:, None, :]
        _, dirs = camera.ndc_to_rays(ndc_pixels)
        entry, exit_, hit = intersection_with_unit_cube(
            cam_pos, dirs, side_length=self.cfg.object_bounding_sphere * 2)
        pts, net_mask = self.pixels_to_world(params, ndc_pixels, camera,
                                             rays=(entry, exit_, hit))

        # candidate points: max-logit point on each ray (most-occupied)
        steps = jax.random.uniform(key, (self.cfg.n_steps,))
        seg = exit_ - entry
        cand = entry[..., None, :] + steps[:, None] * seg[..., None, :]
        logits = f(jax.lax.stop_gradient(cand))            # (B, N, S)
        imax = jnp.argmax(logits, axis=-1)
        best_logit = jnp.take_along_axis(logits, imax[..., None], axis=-1)[..., 0]

        # freespace: out-of-mask rays must be empty everywhere → push the
        # max logit down; occupancy: in-mask rays with no crossing →
        # pull the max logit up (DVR's mask losses)
        free_mask = (~mask_gt) & hit
        occ_mask = mask_gt & (~net_mask) & hit
        return OccupancyOutput(
            surface_points=pts, surface_mask=net_mask & mask_gt,
            network_mask=net_mask,
            logits_freespace=best_logit, freespace_mask=free_mask,
            logits_occupancy=best_logit, occupancy_mask=occ_mask)

    def generate_mesh(self, params, resolution: int = 128):
        """Iso-surface at tau (occupancy_modeling.py:365-386)."""
        from isopoints_tpu.utils.meshing import extract_mesh
        f = self.logits_fn(params)
        return extract_mesh(lambda x: -f(x), resolution=resolution)


def occupancy_bce_loss(logits: jax.Array, target_inside: jax.Array,
                       mask=None, reduction: str = "mean"):
    """BCE on occupancy logits (DVR's freespace/occupied loss)."""
    from isopoints_tpu.training.losses import reduce_loss
    t = target_inside.astype(logits.dtype)
    loss = jax.nn.softplus(logits) - t * logits
    return reduce_loss(loss, mask, reduction)
