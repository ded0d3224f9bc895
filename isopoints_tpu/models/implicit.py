"""Implicit scene model (MVR): SDF decoder + texture + ray engine.

Parity: reference DSS/models/implicit_modeling.py — `Model` (:34),
`pixels_to_world` (:279, DVR-style), `sample_from_pixels` (:422, IDR),
`sample_world_points` (:343, min-SDF free/occupancy candidates),
`forward` (:455-543), `Generator` (:638).

TPU re-design: fully functional — the model object holds configs and
submodule definitions; parameters are an explicit pytree; every method
is pure and full-width over a static (B, N) ray grid with masks
(the reference returns packed per-batch subsets; SURVEY.md §7).
"""

from dataclasses import dataclass, field
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from isopoints_tpu.core.camera import PerspectiveCamera
from isopoints_tpu.models.fields import (
    FieldOutput,
    RenderingNetwork,
    sdf_and_grad,
)
from isopoints_tpu.models.levelset import (
    ProjectionConfig,
    directional_sample_network,
    project_points,
    sample_network,
)
from isopoints_tpu.models.raytracing import (
    RayTracingConfig,
    find_zero_crossing_between_point_pairs,
    intersection_with_unit_cube,
    ray_trace,
    sphere_trace_along_rays,
)
from isopoints_tpu.ops.images import sample_image_at_ndc
from isopoints_tpu.rendering.lighting import DirectionalLights
from isopoints_tpu.rendering.texture import lighting_texture, neural_texture


class ModelOutput(NamedTuple):
    """Padded analogue of the reference forward dict
    (implicit_modeling.py:537-543)."""
    iso_points: jax.Array     # (B, N, 3) differentiable surface points
    iso_mask: jax.Array       # (B, N) on-surface & in-mask
    network_mask: jax.Array   # (B, N) predicted surface hit (gt-independent)
    iso_normals: jax.Array    # (B, N, 3)
    iso_rgb: jax.Array        # (B, N, 3) predicted colors
    iso_rgb_gt: jax.Array     # (B, N, 3) gt image values at projections
    iso_pixels: jax.Array     # (B, N, 2) NDC projections
    p_freespace: jax.Array    # (B, Nf, 3)
    freespace_mask: jax.Array
    sdf_freespace: jax.Array  # (B, Nf)
    p_occupancy: jax.Array    # (B, No, 3)
    occupancy_mask: jax.Array
    sdf_occupancy: jax.Array  # (B, No)
    # ray-compaction overflow counters (scalar int32, 0 when the IDR
    # tracer was not used) — see RayTraceResult.trace_overflow
    overflow_trace: jax.Array = None
    overflow_sampler: jax.Array = None


@dataclass(frozen=True)
class ImplicitConfig:
    """Knobs mirroring implicit_modeling.Model.__init__ (:34-91)."""
    object_bounding_sphere: float = 1.0
    n_points_per_ray: int = 100
    proj_max_iters: int = 10
    proj_tolerance: float = 5e-5
    texture_type: str = "lighting"  # 'lighting' | 'neural'
    shininess: float = 64.0
    # route the no-grad tracing/projection pipelines through the fused
    # Pallas SDF-MLP kernels (ops/pallas_mlp.py) when the decoder
    # supports it; loss-path decoder evals keep the plain (θ-diff) field
    use_fused_mlp: bool = False
    # coarse/fine trace precision schedule: run the first N sphere-
    # tracing iterations with the 1-pass bf16 fused kernel (~1.67x
    # faster), then re-validate and finish at fine precision
    # (RayTracingConfig.coarse_trace_iters). Requires use_fused_mlp;
    # 0 = off.
    coarse_trace_iters: int = 0
    # extra RayTracingConfig field overrides (sampler_fraction,
    # trace_compact_after/fraction, fused_backstep,
    # sampler_coarse(_margin), sampler_chunk_rays, ...) applied LAST —
    # they win over the named fields above. YAML-friendly: lists are
    # coerced to tuples. See RayTracingConfig for semantics and the
    # bench.py schedule for a tuned example.
    raytrace: Optional[dict] = None


class ImplicitModel:
    """SDF decoder + texture + level-set/ray machinery.

    Args:
      decoder: a field object (SirenField / SDFField) with
        init/apply/sdf.
      rendering_net: RenderingNetwork for texture_type='neural'.
    """

    def __init__(self, decoder, rendering_net: Optional[RenderingNetwork] = None,
                 cfg: ImplicitConfig = ImplicitConfig()):
        self.decoder = decoder
        self.rendering_net = rendering_net
        self.cfg = cfg
        if cfg.texture_type == "neural" and rendering_net is None:
            self.rendering_net = RenderingNetwork(dim=9, c_dim=0)
        self.raytrace_cfg = RayTracingConfig(
            object_bounding_sphere=cfg.object_bounding_sphere,
            sdf_threshold=cfg.proj_tolerance,
            sphere_tracing_iters=cfg.proj_max_iters,
            coarse_trace_iters=cfg.coarse_trace_iters)
        if cfg.raytrace:
            import dataclasses
            coerced = {k: tuple(v) if isinstance(v, list) else v
                       for k, v in dict(cfg.raytrace).items()}
            self.raytrace_cfg = dataclasses.replace(self.raytrace_cfg,
                                                    **coerced)
        self.proj_cfg = ProjectionConfig(
            proj_max_iters=cfg.proj_max_iters,
            proj_tolerance=cfg.proj_tolerance)

    # -- params ------------------------------------------------------------
    def init(self, key: jax.Array) -> dict:
        k1, k2 = jax.random.split(key)
        params = {"decoder": self.decoder.init(k1)}
        if self.rendering_net is not None:
            params["texture"] = self.rendering_net.init(k2)
        return params

    def sdf_fn(self, params) -> Callable[[jax.Array], jax.Array]:
        return lambda x: self.decoder.sdf(params["decoder"], x)

    def trace_sdf_fn(self, params) -> Callable[[jax.Array], jax.Array]:
        """SDF callable for the no-grad tracing/projection pipelines.

        With `use_fused_mlp`, returns the fused Pallas kernel (carries
        `.sdf_and_grad` with forward-mode input gradients). Safe only
        where outputs are stop-gradded before the loss — which is every
        tracing path (the reference wraps them in no_grad,
        implicit_modeling.py:293, levelset_sampling.py:725).
        """
        if self.cfg.use_fused_mlp:
            from isopoints_tpu.ops.pallas_mlp import make_fused_sdf_fn
            # cut θ-gradients at the weights: tracing is no-grad by
            # design, and stop-gradding the closure keeps AD from
            # linearizing the pallas_call inside while_loops
            frozen = jax.lax.stop_gradient(params["decoder"])
            fused = make_fused_sdf_fn(self.decoder, frozen)
            if fused is not None:
                return fused
        return self.sdf_fn(params)

    def trace_sdf_fn_coarse(self, params):
        """1-pass bf16 fused kernel for the coarse phase of the trace
        precision schedule, or None when unavailable/disabled (then the
        tracer runs fine-only). Same stop-gradient contract as
        `trace_sdf_fn`. Gates on the EFFECTIVE raytrace config so a
        `raytrace: {coarse_trace_iters: N}` override works too."""
        if not (self.cfg.use_fused_mlp
                and self.raytrace_cfg.coarse_trace_iters > 0):
            return None
        from isopoints_tpu.ops.pallas_mlp import make_fused_sdf_fn
        frozen = jax.lax.stop_gradient(params["decoder"])
        return make_fused_sdf_fn(self.decoder, frozen, precision="bf16")

    def decode(self, params, x) -> FieldOutput:
        return self.decoder.apply(params["decoder"], x)

    def normals_from_grad(self, params, x) -> jax.Array:
        """Raw SDF gradients (implicit_modeling.py:250-277)."""
        _, g = sdf_and_grad(self.sdf_fn(params), x)
        return g

    # -- colors ------------------------------------------------------------
    def decode_color(self, params, points, normals, camera: PerspectiveCamera,
                     lights: Optional[DirectionalLights] = None) -> jax.Array:
        """Per-point RGB via Phong or the neural texture
        (implicit_modeling.py:92-115 decode_color)."""
        if self.cfg.texture_type == "neural":
            view_dirs = camera.view_direction(points)
            return neural_texture(self.rendering_net, params["texture"],
                                  points, normals, view_dirs)
        if lights is None:
            lights = DirectionalLights.create()
        return lighting_texture(points, normals, lights,
                                camera.camera_center(),
                                shininess=self.cfg.shininess)

    # -- ray sampling ------------------------------------------------------
    def pixels_to_world(self, params, ndc_pixels: jax.Array,
                        camera: PerspectiveCamera, training: bool = True
                        ) -> Tuple[jax.Array, jax.Array]:
        """DVR-style intersection: cube interval → bidirectional sphere
        tracing → secant merge → grazing-angle filter → (train)
        directional sampling (implicit_modeling.py:279-343)."""
        f = self.trace_sdf_fn(params)
        cam_pos = camera.camera_center()[:, None, :]
        _, dirs = camera.ndc_to_rays(ndc_pixels)
        entry, exit_, hit = intersection_with_unit_cube(
            cam_pos, dirs, side_length=self.cfg.object_bounding_sphere * 2)

        fwd = sphere_trace_along_rays(f, entry, dirs,
                                      max_iters=self.cfg.proj_max_iters,
                                      tolerance=self.cfg.proj_tolerance)
        mask_pred = fwd.mask & hit
        p_world = jnp.where(mask_pred[..., None], fwd.points, entry)

        bwd = sphere_trace_along_rays(f, exit_, -dirs,
                                      max_iters=self.cfg.proj_max_iters,
                                      tolerance=self.cfg.proj_tolerance)
        p_secant, m_secant = find_zero_crossing_between_point_pairs(
            f, p_world, bwd.points)
        m_secant = (~mask_pred) & m_secant
        p_world = jnp.where(m_secant[..., None], p_secant, p_world)
        mask_pred = mask_pred | m_secant

        # grazing-angle filter (implicit_modeling.py:330-335)
        _, grad = sdf_and_grad(f, p_world)
        gn = grad / jnp.maximum(jnp.linalg.norm(grad, axis=-1, keepdims=True), 1e-12)
        mask_pred = mask_pred & (jnp.sum(gn * dirs, axis=-1) < -1e-2)

        if training:
            # θ-differentiable re-attachment needs the plain field
            p_world = directional_sample_network(
                self.sdf_fn(params), p_world, dirs, cam_pos)
        return p_world, mask_pred

    def sample_from_pixels(self, params, ndc_pixels: jax.Array,
                           camera: PerspectiveCamera, mask_gt: jax.Array,
                           key: jax.Array, training: bool = True):
        """IDR ray tracing wrapper (implicit_modeling.py:422-453).

        Returns (iso_points, mask_pred, free_mask, occ_mask, res):
        every ray yields a point; masks classify it; `res` is the full
        RayTraceResult (candidate points + overflow counters).
        """
        f = self.trace_sdf_fn(params)
        cam_pos = camera.camera_center()[:, None, :]
        _, dirs = camera.ndc_to_rays(ndc_pixels)
        res = ray_trace(f, cam_pos, dirs, mask_gt, key,
                        self.raytrace_cfg, training=training,
                        sdf_fn_coarse=self.trace_sdf_fn_coarse(params))
        iso_points = res.points
        if training:
            iso_points = directional_sample_network(
                self.sdf_fn(params), jax.lax.stop_gradient(res.points),
                dirs, cam_pos)
        free_mask = ~mask_gt
        occ_mask = (~res.network_object_mask) & mask_gt
        return iso_points, res.network_object_mask, free_mask, occ_mask, res

    def sample_world_points(self, params, ndc_pixels: jax.Array,
                            camera: PerspectiveCamera, mask_gt: jax.Array,
                            mask_pred: Optional[jax.Array] = None):
        """Min-SDF candidate per ray between cube intersections
        (implicit_modeling.py:343-420). Returns
        (points, free_mask, occ_mask)."""
        f = self.trace_sdf_fn(params)
        cam_pos = camera.camera_center()[:, None, :]
        _, dirs = camera.ndc_to_rays(ndc_pixels)
        entry, exit_, hit = intersection_with_unit_cube(
            cam_pos, dirs, side_length=self.cfg.object_bounding_sphere * 2)
        in_camera = jnp.all(jnp.abs(ndc_pixels) <= 1.0, axis=-1)

        n = self.cfg.n_points_per_ray
        steps = jnp.linspace(0.0, 1.0, n)
        seg = exit_ - entry
        pts = entry[..., None, :] + steps[:, None] * seg[..., None, :]
        sdf = f(pts)                                         # (B, N, n)
        imin = jnp.argmin(sdf, axis=-1)
        world = jnp.take_along_axis(pts, imin[..., None, None], axis=-2)[..., 0, :]

        free_mask = (~mask_gt) & in_camera & hit
        occ_mask = mask_gt & in_camera & hit
        if mask_pred is not None:
            occ_mask = occ_mask & (~mask_pred)
        return world, free_mask, occ_mask

    # -- forward -----------------------------------------------------------
    def forward(self, params, ndc_pixels: jax.Array, img: jax.Array,
                mask_img: jax.Array, camera: PerspectiveCamera,
                key: jax.Array, lights=None, training: bool = True
                ) -> ModelOutput:
        """Full forward pass (implicit_modeling.py:455-543, IDR branch).

        Args:
          ndc_pixels: (B, N, 2) sampled pixels in NDC.
          img: (B, H, W, 3); mask_img: (B, H, W, 1).
        """
        mask_gt = sample_image_at_ndc(mask_img, ndc_pixels,
                                      mode="nearest")[..., 0] > 0.5
        iso_points, mask_pred, free_mask, occ_mask, trace_res = \
            self.sample_from_pixels(params, ndc_pixels, camera, mask_gt, key,
                                    training=training)
        ray_points = trace_res.points
        iso_mask = mask_gt & mask_pred
        # pixel-grad observability hook (debug.py; reference
        # implicit_modeling.py:545-601 registers backward hooks here)
        from isopoints_tpu.debug import tap_grad
        iso_points = tap_grad("iso", iso_points)

        normals = self.normals_from_grad(params, iso_points)
        rgb = self.decode_color(params, iso_points, normals, camera, lights)

        pix_pred = camera.project_ndc(iso_points)[..., :2]
        rgb_gt = sample_image_at_ndc(img, jax.lax.stop_gradient(pix_pred))

        # positions detached: sdf-mask losses reach decoder params only
        # (the reference evaluates decode() on detached points, :684-688)
        sdf_free = self.decoder.sdf(params["decoder"],
                                    jax.lax.stop_gradient(ray_points))
        sdf_occ = sdf_free  # same candidate points, masks differ (IDR)
        return ModelOutput(
            iso_points=iso_points, iso_mask=iso_mask, network_mask=mask_pred,
            iso_normals=normals,
            iso_rgb=rgb, iso_rgb_gt=rgb_gt, iso_pixels=pix_pred,
            p_freespace=jax.lax.stop_gradient(ray_points),
            freespace_mask=free_mask, sdf_freespace=sdf_free,
            p_occupancy=jax.lax.stop_gradient(ray_points),
            occupancy_mask=occ_mask, sdf_occupancy=sdf_occ,
            overflow_trace=trace_res.trace_overflow,
            overflow_sampler=trace_res.sampler_overflow)

    # -- iso-point extraction ---------------------------------------------
    def get_point_clouds(self, params, points: jax.Array, mask: jax.Array,
                         do_project: bool = False, attach_gradient: bool = True):
        """Project points onto the level set and (optionally) re-attach
        the implicit-differentiation gradient
        (implicit_modeling.py:133-248). Returns (points, normals, mask)."""
        f = self.sdf_fn(params)
        if do_project:
            res = project_points(f, points, mask, self.proj_cfg,
                                 skip_resampling=True, skip_upsampling=True)
            points, mask = res.points, res.mask
            if attach_gradient:
                points = sample_network(f, points)
        normals = self.normals_from_grad(params, points)
        return points, normals, mask
