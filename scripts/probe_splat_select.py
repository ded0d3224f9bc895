"""Same-session A/B: splat frame with the Pallas selection kernel vs
the XLA strip+tile top_k coarse stage (VERDICT r4 item 2).

Bench-identical workload (24.5k splats on a 0.7-sphere, 512px, K=5,
strip 1280 / tile 256). Run on the real TPU with the box QUIET (the
tunneled worker faults under heavy local CPU load). Prints per-variant
frame times + the isolated selection-stage time.
"""

import os
import sys
import time
import dataclasses

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from isopoints_tpu.core.camera import PerspectiveCamera, look_at_view_transform  # noqa: E402
from isopoints_tpu.rendering.rasterizer import (  # noqa: E402
    RasterizationSettings,
    _pixel_ndc,
    _tile_candidates,
    compute_splat_params,
    rasterize_splats,
    splat_spacing,
)
from isopoints_tpu.rendering.pallas_select import select_candidates_pallas  # noqa: E402

REP = 3
N = 24_576
S = 512

k_dir = jax.random.normal(jax.random.key(11), (1, N, 3))
pts = 0.7 * k_dir / jnp.linalg.norm(k_dir, axis=-1, keepdims=True)
nrm = k_dir / jnp.linalg.norm(k_dir, axis=-1, keepdims=True)
mask = jnp.ones((1, N), bool)
R, T = look_at_view_transform([2.5], [0.0], [0.0])
cam = PerspectiveCamera.create(R=R, T=T, focal_length=2.0)
base = RasterizationSettings(image_size=S, use_pallas=True,
                             max_points_per_strip=1280)


def timeit(fn, *args):
    out = fn(*args)
    jax.block_until_ready(out)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return min(ts) / REP, out


spacing = jax.jit(lambda p: splat_spacing(p, mask, base))(pts)
jax.block_until_ready(spacing)


def frame_fn(rset):
    @jax.jit
    def f(p, h_k):
        def loss_fn(q):
            sp = compute_splat_params(q, nrm, mask, cam, rset,
                                      spacing=h_k)
            frags = rasterize_splats(sp.pts_ndc, sp.ellipse, sp.radii,
                                     sp.cutoff, sp.mask, rset)
            return (jnp.sum(frags.occupancy)
                    + jnp.sum(jnp.where(frags.zbuf > 0, frags.zbuf, 0.0)))

        def step(carry, _):
            l, g = jax.value_and_grad(loss_fn)(p + 1e-30 * carry)
            return l, (l, g)
        _, (ls, gs) = jax.lax.scan(step, jnp.float32(0), None, length=REP)
        return ls[-1], gs[-1]
    return f


# isolated selection stage (fwd only), both variants
sp = compute_splat_params(pts, nrm, mask, cam, base, spacing=spacing)
p1, e1, r1, c1, v1 = (sp.pts_ndc[0], sp.ellipse[0], sp.radii[0],
                      sp.cutoff[0], sp.mask[0])
px, py, z = p1[:, 0], p1[:, 1], p1[:, 2]
rx, ry = r1[:, 0], r1[:, 1]
valid = v1 & (z >= 0)
T_tile, M, nt = base.tile_size, base.max_points_per_tile, S // base.tile_size


@jax.jit
def sel_pallas(px, py, z, rx, ry, valid):
    def step(carry, _):
        ci, ok, ovf = select_candidates_pallas(
            px + 1e-30 * carry, py, z, rx, ry, valid, S=S, T=T_tile,
            nt=nt, R=base.max_points_per_strip, M=M, interpret=False)
        return ovf.astype(jnp.float32), (ci, ok, ovf)
    _, outs = jax.lax.scan(step, jnp.float32(0), None, length=REP)
    return jax.tree_util.tree_map(lambda a: a[-1], outs)


@jax.jit
def sel_xla(px, py, z, rx, ry, valid):
    xs = _pixel_ndc(jnp.arange(S), S)
    half = float(T_tile - 1) / S
    cx = 0.5 * (xs[::T_tile] + xs[T_tile - 1::T_tile])

    def one(pxx):
        def row(ti):
            rows = ti * T_tile + jnp.arange(T_tile)
            ys = _pixel_ndc(rows, S)
            cy = 0.5 * (ys[0] + ys[-1])
            return _tile_candidates(pxx, py, z, rx, ry, valid, cy, cx,
                                    half, M,
                                    strip_cap=base.max_points_per_strip)
        return jax.lax.map(row, jnp.arange(nt))

    def step(carry, _):
        ci, ok, ovf = one(px + 1e-30 * carry)
        return ovf.sum().astype(jnp.float32), (ci, ok)
    _, outs = jax.lax.scan(step, jnp.float32(0), None, length=REP)
    return jax.tree_util.tree_map(lambda a: a[-1], outs)


dt, out_p = timeit(sel_pallas, px, py, z, rx, ry, valid)
print(f"selection pallas: {dt*1e3:.2f} ms (ovf={int(out_p[2])})",
      file=sys.stderr)
dt, out_x = timeit(sel_xla, px, py, z, rx, ry, valid)
print(f"selection xla:    {dt*1e3:.2f} ms", file=sys.stderr)

# set equality spot check on TPU outputs
import numpy as np  # noqa: E402

ci_p, ok_p = np.asarray(out_p[0]), np.asarray(out_p[1])
ci_x = np.asarray(out_x[0]).reshape(nt * nt, M)
ok_x = np.asarray(out_x[1]).reshape(nt * nt, M)
bad = 0
for t in range(nt * nt):
    if set(ci_p[t][ok_p[t]].tolist()) != set(ci_x[t][ok_x[t]].tolist()):
        bad += 1
print(f"candidate-set mismatches: {bad}/{nt*nt} tiles", file=sys.stderr)

for label, flag in (("pallas-select", True), ("xla-topk", False)):
    rset = dataclasses.replace(base, use_pallas_selection=flag)
    dt, _ = timeit(frame_fn(rset), pts, spacing)
    print(f"frame fwd+bwd [{label}]: {dt*1e3:.2f} ms "
          f"({N/dt:.0f} splats/s)", file=sys.stderr)
