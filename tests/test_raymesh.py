"""Ray-mesh intersection + mesh-input MVR data generation.

VERDICT r1 item 7: the reference renders arbitrary meshes into the MVR
layout (scripts/create_mvr_data_from_mesh.py); here the exact
Möller–Trumbore ray-caster (ops/raymesh.py) is checked against a numpy
oracle, and the mesh pipeline round-trips: an icosphere mesh renders
to masks/depths matching the analytic sphere, exports to the
MVRDataset layout (incl. dense depth), and the combined trainer takes
steps on it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
from isopoints_tpu.ops.raymesh import ray_mesh_intersect


def octasphere(subdiv: int = 3, radius: float = 0.5):
    """Subdivided-octahedron sphere mesh (test geometry with an exact
    analytic counterpart)."""
    verts = np.array([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                      [0, -1, 0], [0, 0, 1], [0, 0, -1]], np.float64)
    faces = np.array([[0, 2, 4], [2, 1, 4], [1, 3, 4], [3, 0, 4],
                      [2, 0, 5], [1, 2, 5], [3, 1, 5], [0, 3, 5]])
    for _ in range(subdiv):
        edge_mid = {}
        new_faces = []
        verts_list = list(verts)

        def mid(a, b):
            k = (min(a, b), max(a, b))
            if k not in edge_mid:
                m = verts_list[a] + verts_list[b]
                m = m / np.linalg.norm(m)
                edge_mid[k] = len(verts_list)
                verts_list.append(m)
            return edge_mid[k]

        for a, b, c in faces:
            ab, bc, ca = mid(a, b), mid(b, c), mid(c, a)
            new_faces += [[a, ab, ca], [ab, b, bc], [ca, bc, c],
                          [ab, bc, ca]]
        verts = np.asarray(verts_list)
        faces = np.asarray(new_faces)
    return (radius * verts).astype(np.float32), faces.astype(np.int64)


def numpy_moller_trumbore(orig, dirs, verts, faces):
    """Dense numpy oracle: nearest t per ray (inf = miss)."""
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    t_best = np.full(orig.shape[0], np.inf)
    for i in range(orig.shape[0]):
        p = np.cross(dirs[i], e2)
        det = np.einsum("fj,fj->f", e1, p)
        ok = np.abs(det) > 1e-9
        inv = np.where(ok, 1.0 / np.where(ok, det, 1.0), 0.0)
        tv = orig[i] - v0
        u = np.einsum("fj,fj->f", tv, p) * inv
        q = np.cross(tv, e1)
        v = np.dot(q, dirs[i]) * inv
        t = np.einsum("fj,fj->f", e2, q) * inv
        eps = 1e-7
        hit = ok & (u >= -eps) & (v >= -eps) & (u + v <= 1 + eps) & (t > 1e-4)
        if hit.any():
            t_best[i] = t[hit].min()
    return t_best


class TestRayMeshIntersect:
    def test_matches_numpy_oracle(self, rng):
        verts, faces = octasphere(2, 0.5)
        n = 200
        orig = np.tile(np.array([[0.0, 0.0, -2.0]], np.float32), (n, 1))
        ang = rng.uniform(-0.3, 0.3, (n, 2)).astype(np.float32)
        dirs = np.stack([np.tan(ang[:, 0]), np.tan(ang[:, 1]),
                         np.ones(n, np.float32)], -1)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

        ref_t = numpy_moller_trumbore(orig, dirs, verts, faces)
        res = ray_mesh_intersect(jnp.asarray(orig), jnp.asarray(dirs),
                                 jnp.asarray(verts), jnp.asarray(faces),
                                 ray_block=64, face_chunk=100)
        hit = np.asarray(res.hit)
        np.testing.assert_array_equal(hit, np.isfinite(ref_t))
        np.testing.assert_allclose(np.asarray(res.t)[hit], ref_t[hit],
                                   rtol=1e-5, atol=1e-6)
        # hit points really lie on the reported faces' planes
        pts = np.asarray(res.points)[hit]
        fi = np.asarray(res.face_idx)[hit]
        v0 = verts[faces[fi, 0]]
        nrm = np.cross(verts[faces[fi, 1]] - v0, verts[faces[fi, 2]] - v0)
        nrm /= np.linalg.norm(nrm, axis=-1, keepdims=True)
        assert np.abs(np.einsum("ij,ij->i", pts - v0, nrm)).max() < 1e-5

    def test_normals_face_ray_origin(self):
        verts, faces = octasphere(2, 0.5)
        orig = jnp.array([[0.0, 0.0, -2.0]])
        dirs = jnp.array([[0.0, 0.0, 1.0]])
        res = ray_mesh_intersect(orig, dirs, jnp.asarray(verts),
                                 jnp.asarray(faces))
        assert bool(res.hit[0])
        # front face of the sphere: normal points back toward -z
        assert float(res.normals[0, 2]) < -0.9
        np.testing.assert_allclose(float(res.t[0]), 1.5, atol=0.02)

    def test_batched_shape(self):
        verts, faces = octasphere(1, 0.5)
        orig = jnp.zeros((2, 7, 3)) + jnp.array([0.0, 0.0, -2.0])
        dirs = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (2, 7, 3))
        res = ray_mesh_intersect(orig, dirs, jnp.asarray(verts),
                                 jnp.asarray(faces))
        assert res.t.shape == (2, 7)
        assert res.points.shape == (2, 7, 3)
        assert bool(res.hit.all())


class TestMeshMVRPipeline:
    def test_mesh_render_matches_analytic_sphere(self):
        """An icosphere mesh must render (mask + depth) like the
        analytic sphere the rest of the suite is calibrated on."""
        from isopoints_tpu.data.synthetic import render_mesh_view, render_view, sphere_sdf

        verts, faces = octasphere(4, 0.5)
        R, T = look_at_view_transform([2.0], [15.0], [40.0])
        cam = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
        mesh_out = render_mesh_view(jnp.asarray(verts), jnp.asarray(faces),
                                    cam, 48)
        sdf_out = render_view(sphere_sdf(0.5), cam, 48, jax.random.key(0))
        m_mesh = mesh_out["img.mask"][0, ..., 0] > 0.5
        m_sdf = sdf_out["img.mask"][0, ..., 0] > 0.5
        # subdiv-4 octasphere ~ sphere to <0.1% radius: boundary pixels
        # may flip, interior may not
        assert np.sum(m_mesh != m_sdf) <= 12
        # depth on the shared interior matches the analytic z
        inter = m_mesh & m_sdf
        d = mesh_out["img.depth"][0, ..., 0][inter]
        assert d.min() > 1.4 and d.max() < 2.1

    @pytest.mark.slow
    def test_make_mesh_mvr_roundtrip(self, tmp_path):
        """Full VERDICT item-7 round trip: mesh -> MVR directory ->
        MVRDataset (with dense depth) -> trainer steps."""
        from isopoints_tpu.data.dataset import MVRDataset
        from isopoints_tpu.data.synthetic import export_mvr_dataset, make_mesh_mvr
        from isopoints_tpu.utils.io import load_mesh, save_ply

        verts, faces = octasphere(3, 1.7)  # normalize_mesh rescales
        data = make_mesh_mvr(verts, faces, n_views=3, image_size=24,
                             norm_radius=0.5, n_gt_points=500)
        assert data["img.rgb"].shape == (3, 24, 24, 3)
        assert data["img.depth"].shape == (3, 24, 24, 1)
        # normalization: GT samples on the 0.5-sphere
        r = np.linalg.norm(data["points"], axis=-1)
        np.testing.assert_allclose(r, 0.5, atol=0.01)

        out = str(tmp_path / "mvr")
        export_mvr_dataset(data, out)
        ds = MVRDataset(out, load_dense_depth=True)
        assert len(ds) == 3
        item = ds[0]
        assert item["img.rgb"].shape == (24, 24, 3)
        assert "img.depth" in item
        np.testing.assert_allclose(item["img.depth"][..., 0],
                                   data["img.depth"][0, ..., 0], atol=1e-4)
        mesh = load_mesh(str(tmp_path / "mvr" / "mesh.ply"))
        assert mesh["faces"].shape[1] == 3
        gt_pts, gt_nrm, _ = ds.get_pointclouds()
        assert gt_pts is not None and len(gt_pts) == 500

        # the trainer consumes the mesh-rendered data end-to-end
        from isopoints_tpu.models.combined import CombinedConfig, CombinedModel
        from isopoints_tpu.models.fields import SirenField
        from isopoints_tpu.models.implicit import ImplicitConfig
        from isopoints_tpu.rendering.rasterizer import RasterizationSettings
        from isopoints_tpu.training.trainer import MVRTrainer, TrainerConfig

        model = CombinedModel(
            SirenField(hidden_size=32, n_layers=1),
            cfg=ImplicitConfig(proj_max_iters=5),
            combined_cfg=CombinedConfig(max_iso_per_batch=64,
                                        n_points_per_cloud=128,
                                        visibility_image_size=24),
            raster_settings=RasterizationSettings(image_size=24, tile_size=8,
                                                  max_points_per_tile=64))
        trainer = MVRTrainer(model, TrainerConfig(n_rays=64,
                                                  n_eikonal_points=64,
                                                  warm_up_iters=1))
        state = trainer.init_state()
        for it in range(2):
            img = jnp.asarray(ds[it]["img.rgb"])[None]
            mask = jnp.asarray(ds[it]["img.mask"])[None]
            cam = ds.camera([it])
            state, metrics = trainer.train_step(state, img, mask, cam)
            assert np.isfinite(metrics["loss"])

    def test_read_obj(self, tmp_path):
        p = tmp_path / "tri.obj"
        p.write_text("# comment\nv 0 0 0\nv 1 0 0\nv 0 1 0\nv 1 1 0\n"
                     "f 1/1/1 2/2/2 3/3/3\nf 2 4 3\n")
        from isopoints_tpu.utils.io import read_obj

        mesh = read_obj(str(p))
        assert mesh["points"].shape == (4, 3)
        np.testing.assert_array_equal(mesh["faces"],
                                      [[0, 1, 2], [1, 3, 2]])
