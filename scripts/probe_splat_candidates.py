"""Cost of the splat candidate-selection stage (strip+tile top_k) and
a sort-based alternative, on the TPU.

Current coarse stage (rendering/rasterizer.py::_tile_candidates): per
tile-row, top_k over P for the strip (depth-ordered), then per-tile
top_k over the strip. This probe times (a) the full rasterize forward,
(b) the candidate stage alone, (c) a single global (row, depth)-key
sort + contiguous-segment windows replacing the 32 strip top_k calls.

  python scripts/probe_splat_candidates.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform
from isopoints_tpu.rendering.rasterizer import (
    RasterizationSettings,
    _pixel_ndc,
    _tile_candidates,
    compute_splat_params,
    rasterize_splats,
    splat_spacing,
)

N = 24_576
S = 512
REP = 4


def timeit(f, *a):
    out = f(*a)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(*a)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REP)
    return best, out


def main():
    k_dir = jax.random.normal(jax.random.key(11), (1, N, 3))
    pts = 0.7 * k_dir / jnp.linalg.norm(k_dir, axis=-1, keepdims=True)
    nrm = k_dir / jnp.linalg.norm(k_dir, axis=-1, keepdims=True)
    mask = jnp.ones((1, N), bool)
    R, T = look_at_view_transform([2.5], [0.0], [0.0])
    cam = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
    rset = RasterizationSettings(image_size=S, use_pallas=True,
                                 max_points_per_strip=1280)
    spacing = jax.jit(lambda p: splat_spacing(p, mask, rset))(pts)
    sp = compute_splat_params(pts, nrm, mask, cam, rset, spacing=spacing)
    p1 = sp.pts_ndc[0]
    px, py, z = p1[:, 0], p1[:, 1], p1[:, 2]
    rx, ry = sp.radii[0][:, 0], sp.radii[0][:, 1]
    valid = sp.mask[0] & (z >= 0)
    T_tile = rset.tile_size
    nt = S // T_tile
    M = min(rset.max_points_per_tile, N)
    cols = jnp.arange(S)
    xs = _pixel_ndc(cols, S)
    half = float(T_tile - 1) / S
    cx = 0.5 * (xs[::T_tile] + xs[T_tile - 1::T_tile])

    def scan_rep(fn):
        def wrapped(*a):
            def step(carry, _):
                out = fn(*[x + 1e-30 * carry if x.dtype == jnp.float32
                           else x for x in a])
                leaves = jax.tree_util.tree_leaves(out)
                return jnp.float32(leaves[0].astype(jnp.float32).mean()), out
            _, outs = jax.lax.scan(step, jnp.float32(0), None, length=REP)
            return jax.tree_util.tree_map(lambda v: v[-1], outs)
        return jax.jit(wrapped)

    # (a) full forward
    def full(p):
        spp = compute_splat_params(p, nrm, mask, cam, rset, spacing=spacing)
        fr = rasterize_splats(spp.pts_ndc, spp.ellipse, spp.radii,
                              spp.cutoff, spp.mask, rset)
        return fr.occupancy
    t_full, _ = timeit(scan_rep(full), pts)
    print(f"full_forward:           {t_full*1e3:8.2f} ms", flush=True)

    # (b) candidate stage alone (current top_k path)
    def cand(px, py, z, rx, ry):
        def row(ti):
            rows = ti * T_tile + jnp.arange(T_tile)
            ys = _pixel_ndc(rows, S)
            cy = 0.5 * (ys[0] + ys[-1])
            return _tile_candidates(px, py, z, rx, ry, valid, cy, cx,
                                    half, M,
                                    strip_cap=rset.max_points_per_strip)
        ci, co, ov = jax.lax.map(row, jnp.arange(nt))
        return ci, co, ov.sum()
    t_cand, out_c = timeit(scan_rep(cand), px, py, z, rx, ry)
    print(f"candidates_topk:        {t_cand*1e3:8.2f} ms "
          f"(ovf={int(out_c[2])})", flush=True)

    # (b2) same selection, all 32 tile-rows in ONE batched top_k via
    # vmap instead of the sequential lax.map
    rows_all = jnp.arange(nt)[:, None] * T_tile + jnp.arange(T_tile)
    ys_all = _pixel_ndc(rows_all, S)                       # (nt, T)
    cys = 0.5 * (ys_all[:, 0] + ys_all[:, -1])             # (nt,)

    def cand_vmap(px, py, z, rx, ry):
        ci, co, ov = jax.vmap(
            lambda cy: _tile_candidates(
                px, py, z, rx, ry, valid, cy, cx, half, M,
                strip_cap=rset.max_points_per_strip))(cys)
        return ci, co, ov.sum()
    t_cv, out_v = timeit(scan_rep(cand_vmap), px, py, z, rx, ry)
    print(f"candidates_topk_vmap:   {t_cv*1e3:8.2f} ms "
          f"(ovf={int(out_v[2])})", flush=True)

    # (c) sort-based strips: ONE global sort by (row, z) key; per-row
    # strip = contiguous window. Rows a splat touches: y-interval
    # [py - ry - half_row .. py + ry + half_row] in strip units.
    strip_cap = rset.max_points_per_strip

    def cand_sorted(px, py, z, rx, ry):
        # strip r covers pixel rows [r*T, (r+1)T); its center cy(r)
        # decreasing in r. Splat touches strip r iff |py - cy(r)| <=
        # ry + half. cy(r) = (S - 2*r*T - T)/S => r ranges where
        # py +- (ry+half) crosses. Solve r from cy: r = (S - T - S*cy)
        # / (2T).
        ext = ry + half
        r_of = lambda cy: (S - T_tile - S * cy) / (2.0 * T_tile)
        r0 = jnp.ceil(r_of(py + ext)).astype(jnp.int32)
        r1 = jnp.floor(r_of(py - ext)).astype(jnp.int32)
        r0 = jnp.clip(r0, 0, nt - 1)
        r1 = jnp.clip(r1, -1, nt - 1)
        span = 3  # max strips per splat (asserted by overflow count)
        reps = []
        for kk in range(span):
            r = r0 + kk
            ok = (r <= r1) & valid
            key = jnp.where(ok, r.astype(jnp.float32) * 16.0
                            + jnp.clip(z, 0.0, 15.0),
                            jnp.float32(16.0 * nt + 1))
            reps.append(key)
        keys = jnp.concatenate(reps)                      # (span*P,)
        ids = jnp.tile(jnp.arange(N), (span,))
        order = jnp.argsort(keys)
        keys_s = keys[order]
        ids_s = ids[order]
        row_ids = jnp.floor(keys_s / 16.0).astype(jnp.int32)
        seg_start = jnp.searchsorted(row_ids, jnp.arange(nt))
        seg_end = jnp.searchsorted(row_ids, jnp.arange(nt) + 1)
        win = seg_start[:, None] + jnp.arange(strip_cap)[None, :]
        ok_w = win < seg_end[:, None]
        sidx = jnp.take(ids_s, jnp.minimum(win, span * N - 1))  # (nt, cap)
        ovf = jnp.sum(jnp.maximum(seg_end - seg_start - strip_cap, 0))
        # splats touching more than `span` strips are silently clipped
        # — count them as overflow so the honesty gate sees it
        ovf = ovf + jnp.sum(jnp.where(
            valid, jnp.maximum(r1 - r0 + 1 - span, 0), 0))

        # tile stage: same per-tile top_k over the strip window
        def row(args):
            sidx_r, ok_r, ti = args
            rows = ti * T_tile + jnp.arange(T_tile)
            ys = _pixel_ndc(rows, S)
            cy = 0.5 * (ys[0] + ys[-1])
            ci, co, ov = _tile_candidates(
                px[sidx_r], py[sidx_r], z[sidx_r], rx[sidx_r],
                ry[sidx_r], ok_r & valid[sidx_r], cy, cx, half, M)
            return sidx_r[ci], co, ov
        ci, co, ov2 = jax.lax.map(
            row, (sidx, ok_w, jnp.arange(nt)))
        return ci, co, ovf + ov2.sum()
    t_cs, out_s = timeit(scan_rep(cand_sorted), px, py, z, rx, ry)
    print(f"candidates_sorted:      {t_cs*1e3:8.2f} ms "
          f"(ovf={int(out_s[2])})", flush=True)

    # cross-check: same candidate SETS per tile (order may differ)
    import numpy as np
    ci_a = np.asarray(out_c[0]).reshape(-1, M)
    ok_a = np.asarray(out_c[1]).reshape(-1, M)
    ci_b = np.asarray(out_s[0]).reshape(-1, M)
    ok_b = np.asarray(out_s[1]).reshape(-1, M)
    diff = sum(
        set(ci_a[t][ok_a[t]].tolist()) != set(ci_b[t][ok_b[t]].tolist())
        for t in range(ci_a.shape[0]))
    print(f"candidate_set_mismatched_tiles: {diff}/{ci_a.shape[0]}")


if __name__ == "__main__":
    main()
