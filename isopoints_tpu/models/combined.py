"""Combined scene model: implicit SDF + persistent iso-point cloud.

Parity: reference DSS/models/combined_modeling.py — `Model` (:56),
`get_visible_iso_points` (:390), `sample_onsurface_using_isopoints`
(:181), `sample_offsurface_using_isopoints` (:237), `forward` (:481).

The persistent iso-point state is explicit: methods take and return
the `(points, mask)` buffers instead of mutating `self._points` — the
host training loop threads them (the reference mutates module state at
combined_modeling.py:678, which cannot live inside jit).

Full-width re-design: on/off-surface sample sets keep the padded
(B, N) ray/point grids with boolean masks; the reference's packed
concatenations (forward :596-603) become mask unions.
"""

from dataclasses import dataclass
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isopoints_tpu.core.camera import PerspectiveCamera
from isopoints_tpu.models.implicit import ImplicitConfig, ImplicitModel, ModelOutput
from isopoints_tpu.models.levelset import (
    directional_sample_network,
    project_points,
    sample_network,
)
from isopoints_tpu.models.raytracing import intersection_with_unit_cube
from isopoints_tpu.ops.images import sample_image_at_ndc
from isopoints_tpu.ops.points import midpoint_upsample
from isopoints_tpu.rendering.rasterizer import (
    RasterizationSettings,
    compute_splat_params,
    rasterize_splats,
)


@dataclass(frozen=True)
class CombinedConfig:
    max_iso_per_batch: int = 1000
    n_points_per_cloud: int = 5000
    n_insurface_points_per_ray: int = 64
    visibility_image_size: int = 256


def back_camera(camera: PerspectiveCamera) -> PerspectiveCamera:
    """Camera rotated 180° around its y axis, same center
    (combined_modeling.py:302-310)."""
    R = camera.R.at[:, :, 0].multiply(-1.0).at[:, :, 2].multiply(-1.0)
    center = camera.camera_center()
    T = -jnp.einsum("bi,bij->bj", center, R)
    pp = camera.principal_point.at[:, 1].multiply(-1.0)
    return camera.replace(R=R, T=T, principal_point=pp)


class CombinedModel(ImplicitModel):
    """Implicit model + persistent iso-points (combined_modeling.Model)."""

    def __init__(self, decoder, rendering_net=None,
                 cfg: ImplicitConfig = ImplicitConfig(),
                 combined_cfg: CombinedConfig = CombinedConfig(),
                 raster_settings: Optional[RasterizationSettings] = None):
        super().__init__(decoder, rendering_net, cfg)
        self.ccfg = combined_cfg
        # the combined model's rasters are THROWAWAY visibility renders
        # (reference get_visible_points, utils/__init__.py:699-711: a
        # fixed 256px raster regardless of the output resolution) — run
        # them at visibility_image_size, NOT the renderer's image_size.
        # r5: passing the renderer settings through unchanged silently
        # ran three 512px visibility rasters per step in the ablation
        # (the knob was dead) — ~4x the raster work of the reference
        # and the bulk of the combined step's program size.
        import dataclasses
        base = raster_settings or RasterizationSettings()
        self.raster_settings = dataclasses.replace(
            base, image_size=combined_cfg.visibility_image_size)

    def init_points(self, key: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Initial iso-point buffer: random cube points
        (combined_modeling.py:103-112)."""
        n = self.ccfg.n_points_per_cloud
        pts = (jax.random.uniform(key, (1, n, 3)) - 0.5) * 1.5
        return pts, jnp.ones((1, n), dtype=bool)

    # ------------------------------------------------------------------
    def visible_points_mask(self, params, points, mask, normals,
                            camera: PerspectiveCamera,
                            spacing=None) -> jax.Array:
        """Points producing fragments under `camera` — the reference's
        throwaway 256px splat render (utils/__init__.py:699-711).
        `spacing`: cached splat_spacing h_k for `points` (the forward
        hoists ONE kNN for its three visibility renders)."""
        b = camera.batch_size
        tile = lambda x: jnp.broadcast_to(x, (b,) + x.shape[1:])
        sp = compute_splat_params(tile(points), tile(normals), tile(mask),
                                  camera, self.raster_settings,
                                  spacing=spacing)
        frags = rasterize_splats(sp.pts_ndc, sp.ellipse, sp.radii, sp.cutoff,
                                 sp.mask, self.raster_settings)
        return jnp.any(frags.visibility, axis=0, keepdims=True)  # (1, P)

    def get_visible_iso_points(self, params, points, mask,
                               camera: PerspectiveCamera, key: jax.Array,
                               normals=None, vis=None, spacing=None
                               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
        """Visibility-filter → cap/upsample to max_iso_per_batch →
        random 0.05 offset → project (combined_modeling.py:390-478).

        Returns (iso_points (1, M, 3), normals, mask) with static
        capacity M = max_iso_per_batch.
        """
        m = self.ccfg.max_iso_per_batch
        f = self.trace_sdf_fn(params)
        k1, k2 = jax.random.split(key)
        if normals is None:
            from isopoints_tpu.models.fields import sdf_and_grad as _sg
            _, normals = _sg(f, points)
        if vis is None:
            vis = self.visible_points_mask(params, points, mask, normals,
                                           camera, spacing=spacing) & mask

        # cap: keep a random subset of m visible points (subsample path);
        # too-few: midpoint-upsample to m (upsample path). Both reduce to
        # "select up to m, then upsample buffer to target m".
        scores = jnp.where(vis, jax.random.uniform(k1, vis.shape), -1.0)
        _, top_idx = jax.lax.top_k(scores, min(m, points.shape[1]))
        # invalid slots carry the -1.0 sentinel (uniform draws land in
        # [0, 1), including exactly 0.0)
        sel_ok = jnp.take_along_axis(scores, top_idx, axis=-1) > -0.5
        sel = jnp.take_along_axis(points, top_idx[..., None], axis=1)
        if sel.shape[1] < m:
            pad = m - sel.shape[1]
            sel = jnp.pad(sel, ((0, 0), (0, pad), (0, 0)))
            sel_ok = jnp.pad(sel_ok, ((0, 0), (0, pad)))
        up, up_mask = midpoint_upsample(sel, sel_ok, m,
                                        neighborhood_size=8)
        up = up + 0.05 * (jax.random.uniform(k2, up.shape) - 0.5)
        res = project_points(f, up, up_mask, self.proj_cfg,
                             skip_resampling=True, skip_upsampling=True)
        return res.points, res.normals, res.mask

    # ------------------------------------------------------------------
    def sample_onsurface_using_isopoints(self, params, iso_points, iso_mask,
                                         mask_img, camera: PerspectiveCamera,
                                         training: bool = True):
        """In-mask visible iso-points, differentiably re-attached
        (combined_modeling.py:181-233). Returns (points, mask)."""
        f = self.sdf_fn(params)
        b = camera.batch_size
        pts = jnp.broadcast_to(iso_points, (b,) + iso_points.shape[1:])
        msk = jnp.broadcast_to(iso_mask, (b,) + iso_mask.shape[1:])
        pix = camera.project_ndc(pts)[..., :2]
        in_gt = sample_image_at_ndc(mask_img, jnp.clip(pix, -1.0, 1.0),
                                    mode="nearest")[..., 0] > 0.5
        mask = in_gt & msk
        if training:
            if self.cfg.texture_type == "lighting":
                pts = sample_network(f, jax.lax.stop_gradient(pts))
            else:
                cam_pos = camera.camera_center()[:, None, :]
                rays = jax.lax.stop_gradient(pts) - cam_pos
                pts = directional_sample_network(
                    f, jax.lax.stop_gradient(pts), rays, cam_pos)
        return pts, mask

    def sample_offsurface_using_isopoints(self, params, ndc_pixels, mask_img,
                                          iso_points, iso_mask,
                                          points, mask,
                                          camera: PerspectiveCamera,
                                          key: jax.Array,
                                          normals=None, frontal=None,
                                          ray_uniform=None, spacing=None):
        """Freespace + occluded-insurface candidates
        (combined_modeling.py:237-388).

        Freespace: random depths on out-of-mask pixel rays inside the
        cube, plus out-of-mask iso-points. Insurface: for in-mask pixel
        rays, the min-SDF point between the closest frontal and
        back-visible iso-point bounds.

        Returns (p_free (B, Nf, 3), free_mask, p_ins (B, N, 3), ins_mask).
        """
        f = self.trace_sdf_fn(params)
        b = camera.batch_size
        cam_pos = camera.camera_center()[:, None, :]
        _, dirs = camera.ndc_to_rays(ndc_pixels)

        in_gt = sample_image_at_ndc(mask_img, ndc_pixels,
                                    mode="nearest")[..., 0] > 0.5

        # --- freespace on out-of-mask rays (random cube depth)
        entry, exit_, hit = intersection_with_unit_cube(
            cam_pos, dirs, side_length=self.cfg.object_bounding_sphere * 2)
        seg_len = jnp.linalg.norm(exit_ - entry, axis=-1)
        # `ray_uniform` lets the sharded train step pre-sample the
        # per-ray depth draws full-width from a replicated key and pass
        # each shard its slice — mesh(N) then matches mesh(1) exactly
        if ray_uniform is None:
            ray_uniform = jax.random.uniform(key, seg_len.shape)
        t = ray_uniform * seg_len
        p_free_rays = entry + t[..., None] * dirs
        free_rays_mask = (~in_gt) & hit

        # + out-of-mask iso-points (combined_modeling.py:291-299)
        iso_b = jnp.broadcast_to(iso_points, (b,) + iso_points.shape[1:])
        iso_mb = jnp.broadcast_to(iso_mask, (b,) + iso_mask.shape[1:])
        iso_pix = camera.project_ndc(iso_b)[..., :2]
        iso_in_gt = sample_image_at_ndc(mask_img, jnp.clip(iso_pix, -1, 1),
                                        mode="nearest")[..., 0] > 0.5
        p_free = jnp.concatenate([p_free_rays, iso_b], axis=1)
        free_mask = jnp.concatenate([free_rays_mask, (~iso_in_gt) & iso_mb],
                                    axis=1)

        # --- occluded insurface points on in-mask rays (normals and the
        # frontal visibility can be hoisted by the caller — forward
        # already computed them in get_visible_iso_points)
        if normals is None:
            from isopoints_tpu.models.fields import sdf_and_grad as _sg
            normals = jax.lax.stop_gradient(_sg(f, points)[1])
        if frontal is None:
            frontal = self.visible_points_mask(params, points, mask, normals,
                                               camera, spacing=spacing) & mask
        occluded = self.visible_points_mask(params, points, mask, normals,
                                            back_camera(camera),
                                            spacing=spacing) & mask

        def ray_bound(vis_mask):
            # closest point to each ray -> its along-ray length
            pc = points - cam_pos                          # (B?, P, 3) broadcast
            pc = jnp.broadcast_to(pc, (b,) + pc.shape[1:])
            along = jnp.einsum("bpd,bnd->bnp", pc, dirs)   # (B, N, P)
            d2 = jnp.sum(pc * pc, axis=-1)[:, None, :] - along ** 2
            vm = jnp.broadcast_to(vis_mask, (b,) + vis_mask.shape[1:])
            d2 = jnp.where(vm[:, None, :], d2, 1e10)
            nn = jnp.argmin(d2, axis=-1)                   # (B, N)
            t_sq = jnp.take_along_axis(along, nn[..., None], axis=-1)[..., 0] ** 2
            return jnp.sqrt(jnp.maximum(t_sq, 1e-17))

        t0 = ray_bound(frontal)
        t1 = ray_bound(occluded)
        ins_mask = in_gt & (t0 < t1)

        n_steps = self.ccfg.n_insurface_points_per_ray
        steps = jnp.linspace(0.0, 1.0, n_steps + 2)[1:-1]
        ts = t0[..., None] + steps * (t1 - t0)[..., None]
        cand = cam_pos[..., None, :] + ts[..., None] * dirs[..., None, :]
        sdf = f(cand)                                      # (B, N, n)
        imin = jnp.argmin(sdf, axis=-1)
        p_ins = jnp.take_along_axis(cand, imin[..., None, None], axis=-2)[..., 0, :]
        return p_free, free_mask, p_ins, ins_mask

    # ------------------------------------------------------------------
    def forward(self, params, ndc_pixels, img, mask_img,
                camera: PerspectiveCamera, key: jax.Array,
                points=None, points_mask=None, lights=None,
                project: bool = True, sample_iso_offsurface: bool = True,
                training: bool = True, ray_uniform=None, spacing=None):
        """Combined forward (combined_modeling.py:481-732).

        Returns (ModelOutput, new_points, new_points_mask) — the caller
        threads the persistent iso-point buffers.

        `spacing`: optional cached `splat_spacing` h_k (B, P) for
        `points` — the trainer refreshes it on the resample cadence
        instead of paying the kNN every step (the reference recomputes
        its FRNN per forward; splats move slowly between refreshes so
        the EWA radii are insensitive to the staleness — equivalence
        tested in test_training.py). None = compute fresh.
        """
        if not project or points is None:
            # warm-up / no iso-points: pure IDR fallback (:570-593)
            out = super().forward(params, ndc_pixels, img, mask_img, camera,
                                  key, lights=lights, training=training)
            return out, points, points_mask

        k1, k2 = jax.random.split(key)
        # shared no-grad per-point state: computed ONCE for both the
        # visibility-projection and the off-surface bound search
        f_trace = self.trace_sdf_fn(params)
        from isopoints_tpu.models.fields import sdf_and_grad as _sg
        from isopoints_tpu.rendering.rasterizer import splat_spacing
        pts_normals = jax.lax.stop_gradient(_sg(f_trace, points)[1])
        # ONE kNN for all three visibility renders this step (the splat
        # spacing h_k depends only on the point buffer, not the camera);
        # trainer-cached when `spacing` is given
        pts_spacing = spacing if spacing is not None else splat_spacing(
            points, points_mask, self.raster_settings)
        frontal = self.visible_points_mask(params, points, points_mask,
                                           pts_normals, camera,
                                           spacing=pts_spacing) & points_mask

        iso_pts, iso_normals, iso_mask = self.get_visible_iso_points(
            params, points, points_mask, camera, k1,
            normals=pts_normals, vis=frontal)

        ons_pts, ons_mask = self.sample_onsurface_using_isopoints(
            params, iso_pts, iso_mask, mask_img, camera, training=training)
        # pixel-grad observability hook (combined_modeling.py:133-179)
        from isopoints_tpu.debug import tap_grad
        ons_pts = tap_grad("iso", ons_pts)

        if sample_iso_offsurface:
            p_free, free_mask, p_ins, ins_mask = \
                self.sample_offsurface_using_isopoints(
                    params, ndc_pixels, mask_img, iso_pts, iso_mask,
                    points, points_mask, camera, k2,
                    normals=pts_normals, frontal=frontal,
                    ray_uniform=ray_uniform, spacing=pts_spacing)
        else:
            p_free, free_mask, p_ins, ins_mask = (
                ons_pts, jnp.zeros_like(ons_mask),
                ons_pts, jnp.zeros_like(ons_mask))

        normals = self.normals_from_grad(params, ons_pts)
        rgb = self.decode_color(params, ons_pts, normals, camera, lights)
        pix_pred = camera.project_ndc(ons_pts)[..., :2]
        rgb_gt = sample_image_at_ndc(img, jax.lax.stop_gradient(pix_pred))

        sdf_free = self.decoder.sdf(params["decoder"],
                                    jax.lax.stop_gradient(p_free))
        sdf_occ = self.decoder.sdf(params["decoder"],
                                   jax.lax.stop_gradient(p_ins))

        out = ModelOutput(
            iso_points=ons_pts, iso_mask=ons_mask, network_mask=ons_mask,
            iso_normals=normals,
            iso_rgb=rgb, iso_rgb_gt=rgb_gt, iso_pixels=pix_pred,
            p_freespace=jax.lax.stop_gradient(p_free),
            freespace_mask=free_mask, sdf_freespace=sdf_free,
            p_occupancy=jax.lax.stop_gradient(p_ins),
            occupancy_mask=ins_mask, sdf_occupancy=sdf_occ,
            # the combined path samples via iso-points, not the IDR
            # tracer — no compaction capacities in play
            overflow_trace=jnp.zeros((), jnp.int32),
            overflow_sampler=jnp.zeros((), jnp.int32))

        # persistent buffer update (:678): visible iso-points of view 0
        new_points = jax.lax.stop_gradient(iso_pts)
        new_mask = iso_mask
        return out, new_points, new_mask
