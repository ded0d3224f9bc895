"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

The load-bearing guarantee: `make_train_step` is THE step — mesh(8)
must reproduce mesh(1) (loss, metrics, and updated params allclose)
on identical inputs, because `MVRTrainer`/`train_mvr.py --n-devices`
run the same builder. Also checks replication invariants (params
bit-identical across shards after the psum'd update).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
from isopoints_tpu.models.combined import CombinedConfig, CombinedModel
from isopoints_tpu.models.fields import SirenField
from isopoints_tpu.models.implicit import ImplicitConfig
from isopoints_tpu.parallel.sharding import make_mesh, make_train_step
from isopoints_tpu.rendering.rasterizer import RasterizationSettings
from isopoints_tpu.training.trainer import MVRTrainer, TrainerConfig, TrainState


def tiny_model(image_size=32):
    return CombinedModel(
        SirenField(hidden_size=32, n_layers=1),
        cfg=ImplicitConfig(proj_max_iters=5),
        combined_cfg=CombinedConfig(max_iso_per_batch=64,
                                    n_points_per_cloud=128,
                                    visibility_image_size=image_size),
        raster_settings=RasterizationSettings(
            image_size=image_size, tile_size=8, max_points_per_tile=64))


@pytest.fixture(scope="module")
def setup():
    model = tiny_model()
    params = model.init(jax.random.key(0))
    R, T = look_at_view_transform([2.0], [10.0], [0.0])
    camera = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
    img = jnp.ones((1, 32, 32, 3)) * 0.5
    mask_img = jnp.ones((1, 32, 32, 1))
    return model, params, camera, img, mask_img


def run_step(setup, n_devices, project=True, key=3):
    model, params, camera, img, mask_img = setup
    mesh = make_mesh(n_devices)
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    points, points_mask = model.init_points(jax.random.key(1))
    step = make_train_step(model, optimizer, mesh, project=project,
                           n_rays=64, image_size=(32, 32),
                           n_eikonal_points=64)
    hp = {k: jnp.asarray(v) for k, v in
          [("lambda_rgb", 1.0), ("lambda_freespace", 1.0),
           ("lambda_occupied", 1.0), ("lambda_eikonal", 0.01),
           ("sdf_alpha", 10.0)]}
    return step(params, opt_state, points, points_mask, None, img,
                mask_img, camera, hp, jax.random.key(key))


class TestShardedStep:
    def test_eight_device_step_runs(self, setup):
        assert jax.device_count() >= 8, "conftest must force 8 cpu devices"
        params, opt_state, pts, msk, metrics, _sal = run_step(setup, 8)
        assert np.isfinite(float(metrics["loss"]))
        for leaf in jax.tree.leaves(params):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_params_replicated_after_update(self, setup):
        params, *_ = run_step(setup, 8)
        # replicated sharding: addressable shards must be identical
        leaf = jax.tree.leaves(params)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    @pytest.mark.parametrize("project", [True, False])
    def test_sharded_matches_single_device(self, setup, project):
        """mesh(8) == mesh(1) on the same inputs: the SPMD determinism
        contract (full-width replicated sampling + per-segment loss
        normalization, sharding.py / trainer.compute_loss)."""
        p1, _, pts1, msk1, m1, sal1 = run_step(setup, 1, project=project)
        p8, _, pts8, msk8, m8, sal8 = run_step(setup, 8, project=project)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-5, atol=1e-6)
        for k in m1:
            np.testing.assert_allclose(float(m1[k]), float(m8[k]),
                                       rtol=1e-4, atol=1e-6, err_msg=k)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            p1, p8)
        # threaded iso buffers also replicated-deterministic
        np.testing.assert_allclose(np.asarray(pts1), np.asarray(pts8),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(msk1), np.asarray(msk8))
        if project:
            np.testing.assert_allclose(np.asarray(sal1[1]),
                                       np.asarray(sal8[1]),
                                       rtol=1e-5, atol=1e-6)

    def test_two_device_matches_structure(self, setup):
        p2, _, pts2, msk2, m2, _sal = run_step(setup, 2)
        assert np.isfinite(float(m2["loss"]))


class TestHostShardedViews:
    def _batch8(self, setup):
        model, params, camera, img, mask_img = setup
        R, T = look_at_view_transform([2.0] * 8, list(range(0, 360, 45)),
                                      [15.0] * 8)
        cam8 = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        img8 = jnp.tile(img, (8, 1, 1, 1)) * jnp.linspace(
            0.5, 1.0, 8)[:, None, None, None]
        mask8 = jnp.tile(mask_img, (8, 1, 1, 1))
        return model, params, cam8, img8, mask8

    def test_views_sharded_matches_replicated(self, setup):
        """The multi-host input mode (views batch-sharded over the mesh
        + on-device all_gather, parallel/data.py) reproduces the
        replicated-input step exactly on the same global batch."""
        model, params, cam8, img8, mask8 = self._batch8(setup)
        mesh = make_mesh(8)
        optimizer = optax.adam(1e-4)
        opt_state = optimizer.init(params)
        points, points_mask = model.init_points(jax.random.key(1))
        hp = {k: jnp.asarray(v) for k, v in
              [("lambda_rgb", 1.0), ("lambda_freespace", 1.0),
               ("lambda_occupied", 1.0), ("lambda_eikonal", 0.01),
               ("sdf_alpha", 10.0)]}
        args = (params, opt_state, points, points_mask, None, img8,
                mask8, cam8, hp, jax.random.key(3))
        rep_step = make_train_step(model, optimizer, mesh, project=True,
                                   n_rays=64, image_size=(32, 32),
                                   n_eikonal_points=64)
        shd_step = make_train_step(model, optimizer, mesh, project=True,
                                   n_rays=64, image_size=(32, 32),
                                   n_eikonal_points=64, views_sharded=True)
        p_r, _, pts_r, _, m_r, _ = rep_step(*args)
        p_s, _, pts_s, _, m_s, _ = shd_step(*args)
        np.testing.assert_allclose(float(m_r["loss"]), float(m_s["loss"]),
                                   rtol=1e-5, atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            p_r, p_s)
        np.testing.assert_allclose(np.asarray(pts_r), np.asarray(pts_s),
                                   rtol=1e-5, atol=1e-6)

    def test_local_view_indices_partition(self):
        from isopoints_tpu.parallel.data import local_view_indices

        gidx = list(range(16))
        parts = [local_view_indices(gidx, process_index=i, process_count=4)
                 for i in range(4)]
        np.testing.assert_array_equal(np.concatenate(parts), gidx)
        with pytest.raises(ValueError):
            local_view_indices(gidx[:10], process_index=0, process_count=4)

    def test_form_global_batch_sharding(self):
        from isopoints_tpu.parallel.data import form_global_batch

        mesh = make_mesh(8)
        x = np.arange(8 * 4 * 4, dtype=np.float32).reshape(8, 4, 4)
        g = form_global_batch({"img": x}, mesh)["img"]
        assert g.shape == (8, 4, 4)
        assert len(g.addressable_shards) == 8
        # batch axis split: each shard holds one view
        assert g.addressable_shards[0].data.shape == (1, 4, 4)
        np.testing.assert_array_equal(np.asarray(g), x)

    def test_host_sharded_views_iterator(self):
        from isopoints_tpu.parallel.data import HostShardedViews

        class FakeDataset:
            def __len__(self):
                return 12

            def __getitem__(self, i):
                return (np.full((4, 4, 3), float(i), np.float32),
                        np.ones((4, 4, 1), np.float32))

        # two simulated hosts agree on the global batch and split it
        a = HostShardedViews(FakeDataset(), global_batch=4, seed=5,
                             process_index=0, process_count=2)
        b = HostShardedViews(FakeDataset(), global_batch=4, seed=5,
                             process_index=1, process_count=2)
        ia, (img_a, _) = a.next_local()
        ib, (img_b, _) = b.next_local()
        assert img_a.shape == (2, 4, 4, 3) and img_b.shape == (2, 4, 4, 3)
        assert set(ia).isdisjoint(set(ib))
        np.testing.assert_array_equal(img_a[:, 0, 0, 0], ia.astype(np.float32))


class TestShardedProjection:
    def test_newton_sharded_matches_unsharded(self, setup):
        """Point-axis-sharded Newton projection (BASELINE config 5
        "points sharded") is bit-identical to the full-width loop —
        per-point updates are masked, so the shard split cannot change
        any point's trajectory. Includes a capacity (100) that does NOT
        divide the device count (pad path)."""
        from isopoints_tpu.models.levelset import project_points_newton

        sdf = lambda x: jnp.linalg.norm(x, axis=-1) - 0.6
        for p in (128, 100):
            pts = jax.random.uniform(jax.random.key(2), (2, p, 3),
                                     minval=-0.9, maxval=0.9)
            msk = jnp.arange(p)[None, :].repeat(2, 0) < (p - 5)
            r1 = project_points_newton(sdf, pts, msk, max_iters=10,
                                       tolerance=1e-5)
            r8 = project_points_newton(sdf, pts, msk, max_iters=10,
                                       tolerance=1e-5, mesh=make_mesh(8))
            np.testing.assert_array_equal(np.asarray(r1.points),
                                          np.asarray(r8.points))
            np.testing.assert_array_equal(np.asarray(r1.mask),
                                          np.asarray(r8.mask))
            np.testing.assert_array_equal(np.asarray(r1.normals),
                                          np.asarray(r8.normals))
            assert np.asarray(r8.mask).sum() > 0

    def test_sample_uniform_iso_points_on_mesh(self, setup):
        """The full bootstrap pipeline accepts a mesh and produces a
        valid iso-point set with |sdf| <= tol on converged points."""
        from isopoints_tpu.models.levelset import (
            ProjectionConfig,
            sample_uniform_iso_points,
        )

        sdf = lambda x: jnp.linalg.norm(x, axis=-1) - 0.6
        res = sample_uniform_iso_points(sdf, 128, jax.random.key(0),
                                        cfg=ProjectionConfig(),
                                        mesh=make_mesh(8))
        pts = np.asarray(res.points)
        m = np.asarray(res.mask)
        assert m.sum() > 64
        assert np.abs(np.linalg.norm(pts[m], axis=-1) - 0.6).max() < 1e-3


class TestTrainerOnMesh:
    def test_trainer_train_step_on_mesh(self, setup):
        """MVRTrainer drives the SAME sharded step (the flagship path
        train_mvr.py --n-devices exercises)."""
        model, params, camera, img, mask_img = setup
        t1 = MVRTrainer(model, TrainerConfig(n_rays=64, n_eikonal_points=64,
                                             warm_up_iters=0,
                                             resample_every=10_000),
                        mesh=make_mesh(1), seed=7)
        t8 = MVRTrainer(model, TrainerConfig(n_rays=64, n_eikonal_points=64,
                                             warm_up_iters=0,
                                             resample_every=10_000),
                        mesh=make_mesh(8), seed=7)
        s1 = t1.init_state()._replace(it=1)
        s8 = t8.init_state()._replace(it=1)
        s1, m1 = t1.train_step(s1, img, mask_img, camera)
        s8, m8 = t8.train_step(s8, img, mask_img, camera)
        np.testing.assert_allclose(m1["loss"], m8["loss"],
                                   rtol=1e-5, atol=1e-6)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
            s1.params, s8.params)


class TestTrainerViewsSharded:
    def test_trainer_step_with_sharded_views(self, setup):
        """MVRTrainer(views_sharded=True) accepts a batch-sharded view
        batch built by form_global_batch (the train_mvr --multihost
        path) and produces finite metrics."""
        from isopoints_tpu.parallel.data import form_global_batch

        model, params, camera, img, mask_img = setup
        mesh = make_mesh(8)
        trainer = MVRTrainer(model, TrainerConfig(n_rays=64, warm_up_iters=0,
                                                  n_eikonal_points=64),
                             mesh=mesh, views_sharded=True)
        state = trainer.init_state(jax.random.key(0))
        # 8 views (one per device): tile the single test view
        R, T = look_at_view_transform([2.0] * 8, [10.0] * 8, [0.0] * 8)
        cam8 = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        batch = form_global_batch(
            {"img": jnp.tile(img, (8, 1, 1, 1)),
             "mask": jnp.tile(mask_img, (8, 1, 1, 1)),
             "camera": cam8}, mesh)
        state, metrics = trainer.train_step(state, batch["img"],
                                            batch["mask"], batch["camera"])
        assert np.isfinite(metrics["loss"])
        assert state.it == 1
