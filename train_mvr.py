#!/usr/bin/env python
"""Multiview-reconstruction training entry.

Parity: reference train_mvr.py — config load, dataset/model/trainer
assembly, main loop with visualize/checkpoint/validate cadences,
best-model tracking, `--exit-after` checkpoint-and-exit(3).

Usage: python train_mvr.py configs/synthetic_sphere_iso.yml
"""

import argparse
import os
import sys
import time

import numpy as np


def main():
    parser = argparse.ArgumentParser(description="Train an iso-points MVR model.")
    parser.add_argument("config", type=str, help="config yaml path")
    parser.add_argument("--out-dir", type=str, default=None)
    parser.add_argument("--max-iters", type=int, default=2000)
    parser.add_argument("--exit-after", type=int, default=-1,
                        help="checkpoint and exit(3) after this many seconds")
    parser.add_argument("--validate-every", type=int, default=500)
    parser.add_argument("--checkpoint-every", type=int, default=500)
    parser.add_argument("--visualize-every", type=int, default=-1)
    parser.add_argument("--print-every", type=int, default=20)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile-at", type=int, default=-1,
                        help="capture a jax.profiler trace for 5 "
                             "iterations starting at this iteration "
                             "(written to OUT_DIR/profile; view with "
                             "tensorboard or xprof)")
    parser.add_argument("--n-devices", type=int, default=1,
                        help="shard rays over the first N jax devices "
                             "(0 = all devices)")
    parser.add_argument("--multihost", action="store_true",
                        help="multi-host slice: jax.distributed."
                             "initialize() (coordinator auto-detected "
                             "on TPU pods), mesh over ALL global "
                             "devices, per-host view loading over DCN "
                             "(parallel/data.py). Launch one process "
                             "per host.")
    parser.add_argument("--eval-mesh-resolution", type=int, default=96)
    parser.add_argument("--restart-every-resample", action="store_true",
                        help="checkpoint and exit(4) right BEFORE each "
                             "iso-point resample boundary so the runner "
                             "restarts the process and the resample "
                             "runs first in a fresh one. Works around a "
                             "tunneled-TPU worker fault: once the big "
                             "combined step program has executed, "
                             "loading further large programs "
                             "intermittently faults the device "
                             "(UNAVAILABLE; bisected r5 in "
                             "scripts/probe_resample_crash.py — "
                             "pure-XLA, input-independent, "
                             "fresh-process-clean)")
    parser.add_argument("--fresh-keys", action="store_true",
                        help="on resume, do NOT restore the host "
                             "KeyChain from the checkpoint — draw a "
                             "fresh stream (escape hatch for dodging a "
                             "data-dependent fault; default restores "
                             "the stream so a resumed run reproduces "
                             "the uninterrupted one)")
    args = parser.parse_args()

    import jax

    if args.multihost:
        # must run before any other jax call creates the backend
        jax.distributed.initialize()
        args.n_devices = 0  # the global mesh spans every device
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from isopoints_tpu import set_deterministic_seed
    from isopoints_tpu.config import default_config_path, load_config, save_config
    from isopoints_tpu.core.camera import PerspectiveCamera
    from isopoints_tpu.factories import create_dataset, create_model, create_trainer
    from isopoints_tpu.logger import get_logger
    from isopoints_tpu.misc.checkpoints import CheckpointIO
    from isopoints_tpu.training.trainer import TrainState

    log = get_logger()
    set_deterministic_seed(args.seed)
    cfg = load_config(args.config, default_config_path())
    out_dir = args.out_dir or os.path.join(
        "out", os.path.splitext(os.path.basename(args.config))[0])
    os.makedirs(out_dir, exist_ok=True)
    save_config(os.path.join(out_dir, "config.yaml"), cfg)

    from isopoints_tpu.data.dataset import DTUDataset

    data = create_dataset(cfg)
    gt_points = gt_normals = None
    if isinstance(data, dict):  # synthetic: in-memory arrays
        images = data["img.rgb"]
        masks = data["img.mask"]
        cam_mats = data["camera_mat"]
        fl, pp = data["focal_length"], data["principal_point"]
        gt_points = data.get("points")
        gt_normals = data.get("normals")
    else:
        items = [data[i] for i in range(len(data))]
        images = np.stack([i["img.rgb"] for i in items])
        masks = np.stack([i["img.mask"] for i in items])
        if isinstance(data, DTUDataset):
            gt = data.get_gt_pointcloud()
            if gt is not None:
                gt_points = gt["points"]
                gt_normals = gt.get("normals")
        else:
            cam_mats = data.camera_mat
            fl, pp = data.focal_length, data.principal_point
            gt_points, gt_normals, _ = data.get_pointclouds()

    if isinstance(data, DTUDataset):
        # per-view intrinsics from the KRt decomposition
        # (DSS/utils/dataset.py:329-341)
        def get_camera(idx):
            return data.camera(list(idx), images.shape[1:3])
    else:
        def get_camera(idx):
            return PerspectiveCamera.create(
                R=np.stack([cam_mats[i][:3, :3] for i in idx]),
                T=np.stack([cam_mats[i][3, :3] for i in idx]),
                focal_length=fl, principal_point=pp)
    n_views = images.shape[0]
    log.info("dataset: %d views of %s", n_views, images.shape[1:3])

    model = create_model(cfg)
    multihost = args.multihost and jax.process_count() > 1
    trainer = create_trainer(model, cfg, seed=args.seed,
                             n_devices=args.n_devices,
                             views_sharded=multihost)
    # The reference seeds the saliency reference cloud from the MODEL'S
    # OWN iso-points (trainer.py:328 calls ref_per_point_metric with no
    # ref_pcl -> :518 defaults to self.model._points) — never from the
    # dataset GT. Seeding from GT leaks GT geometry into training, so
    # it is opt-in for oracle experiments only; the default path lets
    # update_ref_metric seed from the first projected iso set.
    if (trainer.cfg.saliency_sampling and gt_points is not None
            and cfg["training"].get("saliency_ref_gt", False)):
        trainer.set_reference_cloud(gt_points)
        log.info("saliency reference cloud (ORACLE opt-in): FPS of %d "
                 "GT points", len(gt_points))
    state = trainer.init_state()

    # backend 'orbax' writes sharding-aware directory checkpoints (no
    # host gather on a multi-host mesh); 'npz' is the single-host default
    ckpt = CheckpointIO(out_dir,
                        backend=cfg["training"].get("checkpoint_backend",
                                                    "npz"),
                        model=state.params,
                        opt=state.opt_state, points=state.points,
                        points_mask=state.points_mask)
    it0 = 0
    # the persistent iso-point buffer's CAPACITY is training state too:
    # it tracks the visible-subset / resample-target sizes as they
    # evolve (the reference's dynamic self._points). A resumed run must
    # adopt the checkpoint's capacity — the non-strict loader would
    # otherwise warn "shape mismatch" and silently keep the RANDOM init
    # points (r5 forensics: every resumed r4 ablation attempt trained
    # on random points)
    _npz = os.path.join(out_dir, "model.npz")
    if os.path.exists(_npz):
        with np.load(_npz) as _dd:
            for _nm in ("points", "points_mask"):
                _k = _nm + ":"
                if _k in _dd.files and ckpt.registry.get(_nm) is not None:
                    _tmpl = np.asarray(ckpt.registry[_nm])
                    if _dd[_k].shape != _tmpl.shape:
                        ckpt.registry[_nm] = np.zeros(_dd[_k].shape,
                                                      _tmpl.dtype)
    try:
        scalars = ckpt.load("model.npz")
        it0 = int(scalars.get("it", 0))
        state = TrainState(params=ckpt.registry["model"],
                           opt_state=ckpt.registry["opt"],
                           points=ckpt.registry["points"],
                           points_mask=ckpt.registry["points_mask"], it=it0)
        # the host KeyChain position is training state (VERDICT r4
        # item 8): restore it so the resumed run draws the SAME keys at
        # the same iterations as the uninterrupted run would have
        if "rng_key" in scalars and not args.fresh_keys:
            trainer.keys.set_key_data(scalars["rng_key"])
            log.info("resumed from it=%d (KeyChain restored)", it0)
        else:
            log.info("resumed from it=%d (fresh KeyChain)", it0)
    except FileNotFoundError:
        pass

    # the saliency reference cloud + its accumulated loss stats are
    # HOST state: without persisting them, every restart-every-resample
    # handoff resamples with EMPTY stats (the resample runs at process
    # start) and lossS silently degenerates into uni (r5 forensics:
    # bit-identical metrics through it=1400). Stored beside model.npz.
    _sal_npz = os.path.join(out_dir, "saliency.npz")
    if trainer.cfg.saliency_sampling and os.path.exists(_sal_npz):
        with np.load(_sal_npz) as _sd:
            trainer.load_saliency_state({k: _sd[k] for k in _sd.files})
        log.info("saliency reference state restored (%d ref points)",
                 trainer._ref_points.shape[1])

    def save(name, **extra):
        ckpt.registry.update(model=state.params, opt=state.opt_state,
                             points=state.points,
                             points_mask=state.points_mask)
        ckpt.save(name, it=state.it, rng_key=trainer.keys.key_data,
                  **extra)
        sal = trainer.saliency_state()
        if sal is not None:
            np.savez(_sal_npz, **{k: np.asarray(v) for k, v in sal.items()})

    from isopoints_tpu.misc.metrics import MetricsWriter

    metrics_writer = MetricsWriter(out_dir)
    # view draws are a pure function of (seed, it), not a sequential
    # stream: a resumed run then samples the same views at the same
    # iterations as the uninterrupted run (KeyChain restore above
    # covers the device-side keys)
    def draw_views(it):
        r = np.random.RandomState((args.seed * 1_000_003 + it) % (2**31))
        return r.choice(n_views, size=batch_views,
                        replace=batch_views > n_views)
    # multi-host: the global view batch is sharded over the batch axis
    # of the device mesh, so it must be a multiple of the device count;
    # each host loads only its process-local slice from disk
    # (parallel/data.py). Single-host keeps the reference's 2 views.
    n_dev = trainer.mesh.devices.size
    batch_views = n_dev if multihost else 2
    stage_views = (not multihost
                   and images.nbytes + masks.nbytes < 2 * 1024 ** 3)
    if stage_views:
        # stage ALL views on device once and pick per-step batches with
        # an on-device gather: host slicing ships megabytes of pixels
        # over the (tunneled) host->TPU link EVERY step — measured
        # 0.9 s/iter at 512px/2 views where the train step itself is
        # ~0.1 s. 24 views @ 512px stage in ~100 MB of HBM; datasets
        # beyond 2 GB keep the host path.
        images_dev = jax.device_put(jnp.asarray(images))
        masks_dev = jax.device_put(jnp.asarray(masks))
    # on a multi-host pod only process 0 writes checkpoints, metrics,
    # and meshes (a shared out_dir would otherwise see concurrent
    # writes of the same files from every host)
    is_main = jax.process_index() == 0
    if multihost:
        from isopoints_tpu.parallel.data import (
            form_global_batch,
            local_view_indices,
            sample_global_view_batch,
        )
        view_key = jax.random.key(args.seed)
        log.info("multihost: process %d/%d, %d global devices, "
                 "%d views/step", jax.process_index(), jax.process_count(),
                 n_dev, batch_views)
    t_start = time.time()
    t_last = t_start
    best_iou = -1.0

    # hang watchdog (VERDICT r4 weak #4): if a single loop iteration —
    # train step, resample, eval, or checkpoint — stalls for over
    # `watchdog_s`, dump every thread's stack to stderr so a teed train
    # log shows WHERE the process was when the (tunneled) TPU worker
    # wedged. Re-armed each iteration; exits the process after the
    # second dump so a resume-runner can restart the arm.
    import faulthandler
    # default 600 s: first compiles of the step/eval over the tunnel
    # legitimately take minutes (CLAUDE.md), so the trigger must sit
    # well above them
    watchdog_s = int(os.environ.get("ISOPOINTS_WATCHDOG_S", "600"))

    profiling = False
    warm_up = trainer.cfg.warm_up_iters
    resample_every = trainer.cfg.resample_every
    for it in range(it0, args.max_iters):
        if watchdog_s > 0:
            faulthandler.dump_traceback_later(watchdog_s, repeat=True,
                                              exit=True)
        if (args.restart_every_resample and it > it0 and it >= warm_up
                and (it == warm_up or it % resample_every == 0)):
            # hand the resample to a fresh process (see --help); it0
            # itself is excluded so the restarted process actually
            # performs the resample instead of exiting again
            if watchdog_s > 0:
                faulthandler.cancel_dump_traceback_later()
            if is_main:
                save("model.npz")
            log.info("restart-every-resample: exiting before resample "
                     "at it=%d", it)
            sys.exit(4)
        if args.profile_at >= 0 and it == args.profile_at:
            jax.profiler.start_trace(os.path.join(out_dir, "profile"))
            profiling = True
        if multihost:
            # every host draws the SAME global batch (the shared-seed
            # sampler from parallel.data — never host-local rng, which
            # any host-dependent draw would silently desync), loads
            # only its slice, and contributes the process-local shard
            idx = sample_global_view_batch(
                jax.random.fold_in(view_key, it), n_views, batch_views)
            lidx = local_view_indices(idx)
            local = {"img": images[lidx], "mask": masks[lidx],
                     "camera": get_camera(lidx)}
            gb = form_global_batch(local, trainer.mesh)
            img, mask, camera = gb["img"], gb["mask"], gb["camera"]
        else:
            idx = draw_views(it)
            if stage_views:
                idx_dev = jnp.asarray(idx)
                img = jnp.take(images_dev, idx_dev, axis=0)
                mask = jnp.take(masks_dev, idx_dev, axis=0)
            else:
                img = jnp.asarray(images[idx])
                mask = jnp.asarray(masks[idx])
            camera = get_camera(idx)
        state, metrics = trainer.train_step(state, img, mask, camera)
        if is_main:
            metrics_writer.log(it, metrics)
        if profiling and it >= args.profile_at + 4:
            jax.profiler.stop_trace()
            profiling = False
            log.info("profiler trace written to %s",
                     os.path.join(out_dir, "profile"))

        if it % args.print_every == 0:
            dt = time.time() - t_last
            t_last = time.time()
            log.info("it %05d %s (%.1fs)", it,
                     " ".join(f"{k}={v:.4g}" for k, v in metrics.items()), dt)
        if (is_main and args.checkpoint_every > 0 and it > 0
                and it % args.checkpoint_every == 0):
            log.info("stage: checkpoint it=%d", it)
            save("model.npz")
        if (is_main and args.validate_every > 0 and it > 0
                and it % args.validate_every == 0):
            log.info("stage: eval start it=%d", it)
            # evaluation is host-local: under --multihost the training
            # batch is sharded across hosts (not host-fetchable), so
            # eval always renders host-locally loaded views
            e_idx = np.arange(min(2, n_views))
            e_img = jnp.asarray(images[e_idx])
            e_mask = jnp.asarray(masks[e_idx])
            e_cam = get_camera(e_idx)
            ev = trainer.eval_step(state, e_img, e_mask, e_cam)
            # full-image render + mesh chamfer (reference eval_step /
            # evaluate_mesh, DSS trainer.py:239-301)
            ev.update(trainer.eval_step_full(state, e_img, e_mask, e_cam))
            if gt_points is not None:
                ev.update(trainer.evaluate_mesh_vs_gt(
                    state, gt_points, gt_normals,
                    resolution=args.eval_mesh_resolution))
            metrics_writer.log(it, ev, prefix="eval_")
            log.info("stage: eval done it=%d", it)
            log.info("eval it %05d %s", it,
                     " ".join(f"{k}={v:.4g}" for k, v in ev.items()))
            if ev["iou_full"] > best_iou:
                best_iou = ev["iou_full"]
                save("model_best.npz", loss_val_best=ev["iou_full"])
        if (is_main and args.visualize_every > 0 and it > 0
                and it % args.visualize_every == 0):
            from isopoints_tpu.utils.meshing import extract_mesh
            from isopoints_tpu.utils.io import save_ply
            f = model.sdf_fn(state.params)
            verts, faces = extract_mesh(lambda x: f(x), resolution=96)
            save_ply(os.path.join(out_dir, f"{it:06d}_mesh.ply"), verts,
                     faces=faces)
        if args.exit_after > 0 and time.time() - t_start > args.exit_after:
            if watchdog_s > 0:
                faulthandler.cancel_dump_traceback_later()
            if profiling:
                jax.profiler.stop_trace()
            if is_main:
                save("model.npz")
            log.info("exit-after reached; checkpointed at it=%d", state.it)
            sys.exit(3)

    if watchdog_s > 0:
        faulthandler.cancel_dump_traceback_later()
    if profiling:
        jax.profiler.stop_trace()
    if is_main:
        save("model.npz")
    log.info("done: %d iters in %.1fs", args.max_iters - it0,
             time.time() - t_start)


if __name__ == "__main__":
    main()
