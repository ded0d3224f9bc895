"""Meshing + loss tests with analytic oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.utils.meshing import (
    marching_tetrahedra, extract_mesh, get_surface_high_res_mesh,
    sample_points_from_mesh, largest_component,
)
from isopoints_tpu.training.losses import (
    eikonal_loss, normal_cos_loss, sdf_freespace_loss, sdf_occupancy_loss,
    sal_space_loss, sald_offnormal_loss, iou_loss, projection_loss,
    repulsion_loss, signed_distance_loss, smape_loss,
)


def sphere_vals(res, r=0.6):
    ax = np.linspace(-1, 1, res)
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    return np.sqrt(gx**2 + gy**2 + gz**2) - r


def mesh_volume(verts, faces):
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    return np.abs(np.einsum("ij,ij->i", v0, np.cross(v1, v2)).sum() / 6.0)


def test_mt_sphere_geometry():
    vals = sphere_vals(48)
    sp = 2.0 / 47
    verts, faces = marching_tetrahedra(vals, origin=(-1, -1, -1),
                                       spacing=(sp, sp, sp))
    assert len(verts) > 500 and len(faces) > 1000
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, 0.6, atol=2 * sp)
    # watertight -> volume ≈ 4/3 π r³
    vol = mesh_volume(verts, faces)
    np.testing.assert_allclose(vol, 4 / 3 * np.pi * 0.6**3, rtol=0.02)
    # every edge shared by exactly 2 faces (closed manifold)
    edges = np.sort(np.concatenate(
        [faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]]), axis=1)
    _, counts = np.unique(edges, axis=0, return_counts=True)
    assert (counts == 2).all()


def test_extract_mesh_from_sdf_fn():
    sdf = lambda x: jnp.linalg.norm(x, axis=-1) - 0.5
    verts, faces = extract_mesh(sdf, resolution=40)
    r = np.linalg.norm(verts, axis=-1)
    np.testing.assert_allclose(r, 0.5, atol=0.06)


def test_high_res_mesh_two_stage():
    # ellipsoid: exercises the PCA alignment stage
    scale = jnp.asarray([0.7, 0.3, 0.2])
    sdf = lambda x: jnp.linalg.norm(x / scale, axis=-1) - 1.0
    verts, faces = get_surface_high_res_mesh(sdf, resolution=64, coarse_res=32)
    assert len(verts) > 1000
    q = np.linalg.norm(verts / np.asarray(scale), axis=-1)
    np.testing.assert_allclose(q, 1.0, atol=0.15)


def test_largest_component():
    # two spheres, one bigger
    def sdf(x):
        d1 = jnp.linalg.norm(x - jnp.asarray([0.5, 0, 0]), axis=-1) - 0.3
        d2 = jnp.linalg.norm(x + jnp.asarray([0.5, 0, 0]), axis=-1) - 0.1
        return jnp.minimum(d1, d2)
    verts, faces = extract_mesh(sdf, resolution=48)
    v2, f2 = largest_component(verts, faces)
    assert len(v2) < len(verts)
    # remaining component is the big sphere
    np.testing.assert_allclose(
        np.linalg.norm(v2 - [0.5, 0, 0], axis=-1), 0.3, atol=0.06)


def test_sample_points_from_mesh():
    vals = sphere_vals(32)
    sp = 2.0 / 31
    verts, faces = marching_tetrahedra(vals, origin=(-1, -1, -1), spacing=(sp,) * 3)
    pts, normals = sample_points_from_mesh(verts, faces, 5000)
    np.testing.assert_allclose(np.linalg.norm(pts, axis=-1), 0.6, atol=0.1)
    # normals roughly radial (up to sign)
    cos = np.abs(np.sum(normals * pts / np.linalg.norm(pts, axis=-1, keepdims=True), -1))
    assert cos.mean() > 0.95


def test_losses_analytic():
    g = jnp.asarray([[1.0, 0, 0], [0, 2.0, 0]])
    np.testing.assert_allclose(float(eikonal_loss(g)), 0.5)  # (0² + 1²)/2
    n1 = jnp.asarray([[1.0, 0, 0]]); n2 = jnp.asarray([[-1.0, 0, 0]])
    np.testing.assert_allclose(float(normal_cos_loss(n1, n2, absolute=True)), 0.0, atol=1e-6)
    np.testing.assert_allclose(float(normal_cos_loss(n1, n2, absolute=False)), 2.0, atol=1e-6)
    # freespace loss decreasing in sdf; occupancy increasing
    s = jnp.asarray([-1.0, 0.0, 1.0])
    fl = np.asarray([float(sdf_freespace_loss(s[i:i+1], alpha=2.0)) for i in range(3)])
    assert fl[0] > fl[1] > fl[2]
    ol = np.asarray([float(sdf_occupancy_loss(s[i:i+1], alpha=2.0)) for i in range(3)])
    assert ol[0] < ol[1] < ol[2]
    # SAL: perfect |f| = sqrt(d) -> 0
    np.testing.assert_allclose(
        float(sal_space_loss(jnp.asarray([0.3]), jnp.asarray([0.09]))), 0.0, atol=1e-6)
    # SALD symmetric in normal sign
    gg = jnp.asarray([[0.0, 0.0, 1.0]])
    np.testing.assert_allclose(
        float(sald_offnormal_loss(gg, -gg)), 0.0, atol=1e-6)
    # IoU of identical masks -> loss -1
    m = jnp.ones((1, 8, 8))
    np.testing.assert_allclose(float(iou_loss(m, m)), -1.0, atol=1e-6)
    assert float(smape_loss(jnp.asarray([1.0]), jnp.asarray([1.0]))) == 0.0


def test_projection_repulsion_losses(rng):
    # noisy plane: projection loss > 0 and its gradient pulls points
    # toward the plane
    pts = np.concatenate([rng.rand(1, 200, 2),
                          rng.randn(1, 200, 1) * 0.02], -1).astype(np.float32)
    normals = np.zeros((1, 200, 3), np.float32); normals[..., 2] = 1.0
    mask = jnp.ones((1, 200), bool)

    def ploss(p):
        return projection_loss(p, jnp.asarray(normals), mask, knn_k=16)

    val, grad = jax.value_and_grad(ploss)(jnp.asarray(pts))
    assert float(val) > 0
    # gradient direction reduces |z|
    step = np.asarray(jnp.asarray(pts) - 0.05 * grad)
    assert np.abs(step[..., 2]).mean() < np.abs(pts[..., 2]).mean()

    def rloss(p):
        return repulsion_loss(p, jnp.asarray(normals), mask, knn_k=16)

    v, g = jax.value_and_grad(rloss)(jnp.asarray(pts))
    assert bool(jnp.isfinite(g).all())
    assert float(v) < 0  # negative of distances (maximized)


class TestNativeMarchingTets:
    def test_native_matches_numpy(self):
        """C++ extraction must match the numpy path to float roundoff
        (same decomposition, dedup, and postprocessing)."""
        import isopoints_tpu.ops.native as natmod
        from isopoints_tpu.ops.native import get_native_lib

        if get_native_lib() is None:
            import pytest
            pytest.skip("no native toolchain")
        n = 32
        g = np.linspace(-1, 1, n)
        X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
        vals = np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - 0.5
        origin = (-1.0, -1.0, -1.0)
        sp = (2 / (n - 1),) * 3
        v_native, f_native = marching_tetrahedra(vals, origin, sp, 0.0)
        orig = natmod.marching_tetrahedra_native
        natmod.marching_tetrahedra_native = lambda *a, **k: None
        try:
            v_np, f_np = marching_tetrahedra(vals, origin, sp, 0.0)
        finally:
            natmod.marching_tetrahedra_native = orig
        assert len(v_native) == len(v_np)
        assert len(f_native) == len(f_np)
        iN = np.lexsort(v_native.T)
        ip = np.lexsort(v_np.T)
        np.testing.assert_allclose(v_native[iN], v_np[ip], atol=1e-5)


class TestSignedDistanceLoss:
    """SignedDistanceLoss parity (reference losses.py:536-599): sign via
    inside/outside parity against the GT mesh, magnitude via exact
    point-face distance, loss = (sign·dist − sdf)²."""

    def _sphere_mesh(self, resolution=40, r=0.5):
        sdf = lambda x: jnp.linalg.norm(x, axis=-1) - r
        verts, faces = extract_mesh(sdf, resolution=resolution)
        return jnp.asarray(verts), jnp.asarray(faces), sdf

    def test_zero_at_true_signed_distance(self, rng):
        verts, faces, sdf = self._sphere_mesh()
        pts = jnp.asarray(rng.uniform(-0.8, 0.8, (256, 3)), jnp.float32)
        true_sd = sdf(pts)
        loss = signed_distance_loss(pts, true_sd, verts, faces)
        # bounded by the marching-tet discretization of the sphere
        assert float(loss) < 1e-4, float(loss)
        # wrong-sign predictions are heavily penalized
        loss_flipped = signed_distance_loss(pts, -true_sd, verts, faces)
        assert float(loss_flipped) > 100 * max(float(loss), 1e-9)

    def test_sign_parity(self):
        verts, faces, _ = self._sphere_mesh()
        pts = jnp.asarray([[0.0, 0.0, 0.0],        # deep inside
                           [0.3, 0.0, 0.0],        # inside
                           [0.0, 0.7, 0.0],        # outside
                           [-0.9, -0.1, 0.2]],     # outside
                          jnp.float32)
        # recover sign·dist by supervising sdf=0: loss = dist²; compare
        # against per-point losses with the true signed values instead
        per_true = signed_distance_loss(
            pts, jnp.linalg.norm(pts, axis=-1) - 0.5, verts, faces,
            reduction="none")
        assert float(jnp.max(per_true)) < 2e-4, np.asarray(per_true)

    def test_gradients_flow_to_sdf_and_points(self, rng):
        verts, faces, sdf = self._sphere_mesh(resolution=24)
        pts = jnp.asarray(rng.uniform(-0.7, 0.7, (64, 3)), jnp.float32)

        def f(p, s):
            return signed_distance_loss(p, s, verts, faces)

        gp, gs = jax.grad(f, argnums=(0, 1))(pts, sdf(pts) * 0.5)
        assert np.isfinite(np.asarray(gp)).all()
        assert float(jnp.abs(gs).max()) > 0
        assert float(jnp.abs(gp).max()) > 0

    def test_masked_reduction(self, rng):
        verts, faces, sdf = self._sphere_mesh(resolution=24)
        pts = jnp.asarray(rng.uniform(-0.7, 0.7, (32, 3)), jnp.float32)
        wrong = jnp.ones((32,), jnp.float32) * 5.0
        mask = jnp.zeros((32,), bool).at[:4].set(True)
        full = signed_distance_loss(pts, wrong, verts, faces,
                                    reduction="none")
        masked = signed_distance_loss(pts, wrong, verts, faces,
                                      mask=mask, reduction="sum")
        np.testing.assert_allclose(float(masked),
                                   float(jnp.sum(full[:4])), rtol=1e-6)
