"""Ray-mesh intersection (Möller–Trumbore), blocked for TPU.

The reference generates MVR training data by rasterizing arbitrary
meshes with pytorch3d's MeshRenderer
(scripts/create_mvr_data_from_mesh.py:141-215). The TPU-native
equivalent ray-casts the mesh with the framework's own camera/ray
stack: exact per-ray nearest-triangle intersection, computed as dense
(ray-block x face-chunk) batched arithmetic — all static shapes, a
`lax.scan` over face chunks carrying the per-ray running minimum and a
`lax.map` over ray blocks bounding peak memory. No BVH: for data
generation (10^4-10^5 rays x 10^4-10^6 faces) the brute-force tensor
form is bandwidth-friendly and compiles to a handful of fused
elementwise passes, which beats host-side tree traversal at these
sizes on accelerators.
"""

from typing import NamedTuple

import jax
import jax.numpy as jnp

_BIG = 1e10
_EPS_DET = 1e-9


class RayMeshResult(NamedTuple):
    t: jax.Array         # (..., N) hit distance along the ray (_BIG = miss)
    hit: jax.Array       # (..., N) bool
    face_idx: jax.Array  # (..., N) int32 nearest face (-1 = miss)
    points: jax.Array    # (..., N, 3) hit points (origin at miss)
    normals: jax.Array   # (..., N, 3) flat face normals, oriented toward
    #                     the ray origin (zeros at miss)


def _chunk_intersect(orig, dirs, v0, e1, e2, t_min):
    """One (ray-block x face-chunk) Möller–Trumbore pass.

    orig/dirs: (nb, 3); v0/e1/e2: (fc, 3). Returns per-ray best
    (t, local face idx) over the chunk.
    """
    pvec = jnp.cross(dirs[:, None, :], e2[None, :, :])      # (nb, fc, 3)
    det = jnp.sum(e1[None] * pvec, axis=-1)                 # (nb, fc)
    inv_det = jnp.where(jnp.abs(det) > _EPS_DET, 1.0 / det, 0.0)
    tvec = orig[:, None, :] - v0[None, :, :]
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, e1[None, :, :])
    v = jnp.sum(dirs[:, None, :] * qvec, axis=-1) * inv_det
    t = jnp.sum(e2[None] * qvec, axis=-1) * inv_det
    eps = 1e-7  # watertight-ish: tolerate edge-on barycentrics
    ok = ((jnp.abs(det) > _EPS_DET) & (u >= -eps) & (v >= -eps)
          & (u + v <= 1.0 + eps) & (t > t_min))
    t = jnp.where(ok, t, _BIG)
    best = jnp.argmin(t, axis=-1)                           # (nb,)
    return jnp.take_along_axis(t, best[:, None], axis=-1)[:, 0], best


def ray_mesh_intersect(origins: jax.Array, dirs: jax.Array,
                       verts: jax.Array, faces: jax.Array,
                       t_min: float = 1e-4,
                       ray_block: int = 1024,
                       face_chunk: int = 4096) -> RayMeshResult:
    """Nearest ray-triangle intersection for every ray.

    origins/dirs: (..., N, 3) (dirs need not be normalized — `t` is in
    units of |dir|); verts: (V, 3) f32; faces: (F, 3) int.
    """
    batch_shape = origins.shape[:-1]
    orig_f = origins.reshape(-1, 3).astype(jnp.float32)
    dirs_f = dirs.reshape(-1, 3).astype(jnp.float32)
    n = orig_f.shape[0]

    verts = jnp.asarray(verts, jnp.float32)
    faces = jnp.asarray(faces, jnp.int32)
    f_total = faces.shape[0]
    v0 = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - v0
    e2 = verts[faces[:, 2]] - v0
    # pad faces to a chunk multiple with degenerate (never-hit) tris
    fc = min(face_chunk, f_total)
    f_pad = -(-f_total // fc) * fc
    pad = f_pad - f_total
    if pad:
        v0 = jnp.concatenate([v0, jnp.zeros((pad, 3))])
        e1 = jnp.concatenate([e1, jnp.zeros((pad, 3))])
        e2 = jnp.concatenate([e2, jnp.zeros((pad, 3))])
    n_chunks = f_pad // fc
    v0c = v0.reshape(n_chunks, fc, 3)
    e1c = e1.reshape(n_chunks, fc, 3)
    e2c = e2.reshape(n_chunks, fc, 3)

    nb = min(ray_block, max(n, 1))
    n_pad = -(-n // nb) * nb
    orig_p = jnp.zeros((n_pad, 3)).at[:n].set(orig_f)
    dirs_p = jnp.ones((n_pad, 3)).at[:n].set(dirs_f)

    def one_block(args):
        ob, db = args

        def scan_body(carry, chunk):
            best_t, best_f = carry
            cv0, ce1, ce2, base = chunk
            t, loc = _chunk_intersect(ob, db, cv0, ce1, ce2, t_min)
            take = t < best_t
            best_f = jnp.where(take, base + loc, best_f)
            best_t = jnp.minimum(best_t, t)
            return (best_t, best_f), None

        init = (jnp.full((nb,), _BIG), jnp.full((nb,), -1, jnp.int32))
        bases = jnp.arange(n_chunks, dtype=jnp.int32) * fc
        (bt, bf), _ = jax.lax.scan(scan_body, init,
                                   (v0c, e1c, e2c, bases))
        return bt, bf

    shp = lambda x: x.reshape(n_pad // nb, nb, 3)
    t_all, f_all = jax.lax.map(one_block, (shp(orig_p), shp(dirs_p)))
    t_all = t_all.reshape(-1)[:n]
    f_all = f_all.reshape(-1)[:n]

    hit = t_all < _BIG * 0.5
    f_safe = jnp.maximum(f_all, 0)
    n_flat = jnp.cross(e1[f_safe], e2[f_safe])
    n_flat = n_flat / jnp.maximum(
        jnp.linalg.norm(n_flat, axis=-1, keepdims=True), 1e-12)
    # orient toward the ray origin (flat shading convention)
    n_flat = jnp.where(
        jnp.sum(n_flat * dirs_f, axis=-1, keepdims=True) > 0, -n_flat, n_flat)
    pts = orig_f + jnp.where(hit, t_all, 0.0)[:, None] * dirs_f
    f_out = jnp.where(hit, f_all, -1)
    zero3 = jnp.zeros_like(pts)
    return RayMeshResult(
        t=t_all.reshape(batch_shape),
        hit=hit.reshape(batch_shape),
        face_idx=f_out.reshape(batch_shape),
        points=pts.reshape(batch_shape + (3,)),
        normals=jnp.where(hit[:, None], n_flat,
                          zero3).reshape(batch_shape + (3,)))
