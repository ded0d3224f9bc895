"""Pallas streaming kNN vs the dense oracle (interpret mode on CPU).

The kernel must be EXACT: same distances, indices, ascending order,
first-occurrence tie-breaking, masked/padded semantics, -1 padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.ops.neighbors import knn_points
from isopoints_tpu.ops.pallas_knn import knn_points_pallas


def _assert_same_neighbors(a, b, atol=1e-5):
    """Same distances everywhere; indices equal except at rounding-level
    ties (the two paths round the distance expansion differently, so
    equal-within-eps neighbors may swap order)."""
    da, db = np.asarray(a.dists), np.asarray(b.dists)
    np.testing.assert_allclose(da, db, atol=atol)
    np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))
    ia, ib = np.asarray(a.idx), np.asarray(b.idx)
    diff = ia != ib
    assert np.abs(da[diff] - db[diff]).max(initial=0.0) < 1e-5, \
        "index mismatch at non-tied distances"


def _clouds(b=2, n=700, p=3000, seed=0):
    pts = jax.random.normal(jax.random.key(seed), (b, p, 3))
    q = jax.random.normal(jax.random.key(seed + 1), (b, n, 3))
    pmask = jax.random.bernoulli(jax.random.key(seed + 2), 0.9, (b, p))
    qmask = jax.random.bernoulli(jax.random.key(seed + 3), 0.9, (b, n))
    return q, pts, qmask, pmask


class TestPallasKNN:
    def test_matches_dense(self):
        q, pts, qmask, pmask = _clouds()
        a = knn_points(q, pts, qmask, pmask, k=6, method="dense")
        b = knn_points_pallas(q, pts, qmask, pmask, k=6)
        _assert_same_neighbors(a, b)

    def test_self_exclusion(self):
        _, pts, _, pmask = _clouds(seed=5)
        a = knn_points(pts, pts, pmask, pmask, k=8, exclude_self=True,
                       method="dense")
        b = knn_points_pallas(pts, pts, pmask, pmask, k=8,
                              exclude_self=True)
        _assert_same_neighbors(a, b)

    def test_k_exceeds_points(self):
        q, pts, _, _ = _clouds(b=1, n=5, p=3, seed=9)
        a = knn_points(q, pts, k=6, method="dense")
        b = knn_points_pallas(q, pts, k=6)
        np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
        np.testing.assert_array_equal(np.asarray(a.mask), np.asarray(b.mask))

    def test_duplicate_points_tiebreak(self):
        """Coincident points: first occurrence (lowest index) wins, as
        in the dense path."""
        pts = jnp.array([[[0.0, 0, 0], [1, 0, 0], [1, 0, 0],
                          [0, 1, 0]]] )
        q = jnp.array([[[0.9, 0.0, 0.0]]])
        a = knn_points(q, pts, k=2, method="dense")
        b = knn_points_pallas(q, pts, k=2)
        np.testing.assert_array_equal(np.asarray(a.idx), np.asarray(b.idx))
        assert int(b.idx[0, 0, 0]) == 1

    def test_pruned_multichunk_clustered(self):
        """Clustered cloud spanning several 2048-point chunks: the
        Morton sort + bbox prune + ring visit order must still return
        the exact dense answer (a wrongly skipped chunk would drop
        true neighbors)."""
        key = jax.random.key(42)
        centers = jax.random.uniform(jax.random.key(41), (6, 1, 3),
                                     minval=-3.0, maxval=3.0)
        pts = (centers + 0.2 * jax.random.normal(
            key, (6, 1500, 3))).reshape(1, -1, 3)          # 3 chunks
        q = pts[:, ::7] + 0.05
        a = knn_points(q, pts, k=6, method="dense")
        b = knn_points_pallas(q, pts, k=6)
        _assert_same_neighbors(a, b)

    def test_jit_and_grad_safety(self):
        """jit-compatible; masked-out rows produce no NaNs."""
        q, pts, qmask, pmask = _clouds(b=1, n=96, p=500, seed=11)
        pts = pts.at[0, 0].set(jnp.nan)          # garbage in a masked row
        pmask = pmask.at[0, 0].set(False)
        res = jax.jit(lambda q, p: knn_points_pallas(
            q, p, qmask, pmask, k=4))(q, pts)
        d = np.asarray(res.dists)[np.asarray(res.mask)]
        assert np.isfinite(d).all()
