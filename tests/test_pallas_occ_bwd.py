"""Pallas occupancy-backward kernel vs the XLA patch oracle
(interpret mode on CPU). Exact up to summation-order rounding."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.rendering.pallas_occ_bwd import occ_backward_pallas_one
from isopoints_tpu.rendering.rasterizer import (
    RasterizationSettings,
    _occ_backward_one,
)


def _case(n=600, s_img=128, seed=0, edge_cluster=False):
    k = jax.random.key(seed)
    pts3 = jax.random.normal(k, (n, 3))
    pts3 = 0.7 * pts3 / jnp.linalg.norm(pts3, axis=-1, keepdims=True)
    if edge_cluster:
        # push a third of the points to the image border (patch clamps)
        pts3 = pts3.at[: n // 3, 0].set(0.98)
    pts = jnp.stack([pts3[:, 0], pts3[:, 1], 2.5 + pts3[:, 2]], -1)
    radii = jnp.abs(jax.random.normal(jax.random.key(seed + 1),
                                      (n, 2))) * 0.02 + 0.01
    visible = jax.random.bernoulli(jax.random.key(seed + 2), 0.85, (n,))
    sparse = jax.random.bernoulli(jax.random.key(seed + 3), 0.3,
                                  (s_img, s_img))
    grad = jax.random.normal(jax.random.key(seed + 4),
                             (s_img, s_img)) * sparse
    return pts, radii, visible, grad


class TestPallasOccBackward:
    @pytest.mark.parametrize("seed", [0, 7])
    def test_matches_xla_patch(self, seed):
        pts, radii, vis, grad = _case(seed=seed)
        s = RasterizationSettings(image_size=128)
        a = _occ_backward_one(pts, radii, vis, grad, s)
        b = occ_backward_pallas_one(pts, radii, vis, grad, s)
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-6)

    def test_border_points(self):
        pts, radii, vis, grad = _case(seed=3, edge_cluster=True)
        s = RasterizationSettings(image_size=128)
        a = _occ_backward_one(pts, radii, vis, grad, s)
        b = occ_backward_pallas_one(pts, radii, vis, grad, s)
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-6)

    def test_small_image_full_band(self):
        """WB clamps to the whole image when S <= patch + 8."""
        pts, radii, vis, grad = _case(n=200, s_img=64, seed=5)
        s = RasterizationSettings(image_size=64)
        a = _occ_backward_one(pts, radii, vis, grad, s)
        b = occ_backward_pallas_one(pts, radii, vis, grad, s)
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-6)

    def test_column_strips_match_xla(self):
        """S=256 > strip width 128: exercises the overlapping-strip
        path (nb=3) incl. strip selection at the image borders."""
        pts, radii, vis, grad = _case(n=400, s_img=256, seed=8,
                                      edge_cluster=True)
        s = RasterizationSettings(image_size=256)
        a = _occ_backward_one(pts, radii, vis, grad, s)
        b = occ_backward_pallas_one(pts, radii, vis, grad, s)
        scale = np.abs(np.asarray(a)).max() + 1e-6
        np.testing.assert_allclose(np.asarray(b) / scale,
                                   np.asarray(a) / scale, atol=1e-6)

    def test_invisible_points_get_zero(self):
        pts, radii, _, grad = _case(n=100, s_img=64, seed=6)
        vis = jnp.zeros((100,), bool)
        s = RasterizationSettings(image_size=64)
        b = occ_backward_pallas_one(pts, radii, vis, grad, s)
        np.testing.assert_array_equal(np.asarray(b), 0.0)
