"""Pallas fine-stage splat rasterization kernel (TPU).

The fine stage of the tiled rasterizer (rendering/rasterizer.py): for
each TxT pixel tile, score its M candidate splats and keep the K
closest by depth per pixel. The XLA path materializes the (T², M)
score matrix and runs a full `top_k` sort per pixel; this kernel keeps
everything in VMEM and selects the K minima with K masked-min sweeps —
no sort, one kernel per tile, outputs streamed straight to HBM.

Mirrors the CUDA fine kernel's role (rasterize_points.cu:506-597) with
the TPU-native selection strategy (masked vector min instead of the
warp-divergent insertion sort).

The coarse stage (per-tile front-most candidate selection) stays in
XLA — a single batched `top_k`, the analogue of the reference building
bin lists outside the fine kernel.

MEASURED (TPU v5e): scale decides the winner.
  * S=128, 4096 splats: XLA 0.2 ms/frame vs 30 ms for this kernel
    (the tile grid serializes; launch overhead dominates).
  * S=512, 24576 splats, M=256, K=5 (production/bench scale): this
    kernel 63 ms vs 107 ms for the XLA path — the XLA fine stage
    materializes (nt·T², M) score tensors through HBM while this
    kernel keeps them in VMEM.
Default remains OFF (`RasterizationSettings.use_pallas`); enable for
large frames (≥512 px, ≥10k splats) — bench.py does. Agreement with
the XLA path is covered by tests on CPU (interpret) and was confirmed
bit-exact on TPU hardware.
"""

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e10


def _fine_kernel(T: int, M: int, K: int, S: int, nt: int,
                 depth_merging_threshold: float):
    """Kernel body. Grid = (n_tiles,) where tile i covers rows
    [ti*T, ti*T+T) x cols [tj*T, ...), ti = i // nt, tj = i % nt."""

    def kernel(px_ref, py_ref, z_ref, ea_ref, eb_ref, ec_ref,
               rx_ref, ry_ref, cut_ref, ok_ref,
               idx_ref, zbuf_ref, qv_ref, occ_ref):
        i = pl.program_id(0)
        ti = i // nt
        tj = i % nt

        # pixel-center NDC coords for this tile: (T², 1)
        rows = ti * T + jax.lax.broadcasted_iota(jnp.int32, (T * T, 1), 0) // T
        cols = tj * T + jax.lax.broadcasted_iota(jnp.int32, (T * T, 1), 0) % T
        xf = (S - 2.0 * cols.astype(jnp.float32) - 1.0) / S
        yf = (S - 2.0 * rows.astype(jnp.float32) - 1.0) / S

        px = px_ref[0, 0, :]      # (M,)
        py = py_ref[0, 0, :]
        z = z_ref[0, 0, :]
        ea, eb, ec = ea_ref[0, 0, :], eb_ref[0, 0, :], ec_ref[0, 0, :]
        rx, ry = rx_ref[0, 0, :], ry_ref[0, 0, :]
        cut = cut_ref[0, 0, :]
        ok = ok_ref[0, 0, :] > 0

        dx = xf - px              # (T², M)
        dy = yf - py
        q = ea * dx * dx + eb * dx * dy + ec * dy * dy
        inside = (jnp.abs(dx) <= rx) & (jnp.abs(dy) <= ry) & (q <= cut) & ok

        zwork = jnp.where(inside, z, _BIG)
        occ_ref[0, 0, :] = jnp.any(inside, axis=1).astype(jnp.float32)

        cand_ids = jax.lax.broadcasted_iota(jnp.int32, (T * T, M), 1)
        z0 = jnp.full((T * T,), _BIG, jnp.float32)
        for k in range(K):
            zmin = jnp.min(zwork, axis=1)                     # (T²,)
            amin = jnp.argmin(zwork, axis=1)                  # (T²,)
            hit = zmin < _BIG * 0.5
            if k == 0:
                z0 = zmin
            # depth-merging cut (rasterize_points.cu:201-210)
            keep = hit & ((zmin - z0) <= depth_merging_threshold)
            # one-hot select (Mosaic has no general gather on TPU)
            onehot = cand_ids == amin[:, None]
            sel_q = jnp.sum(jnp.where(onehot, q, 0.0), axis=1)
            idx_ref[0, :, k] = jnp.where(keep, amin, -1)
            zbuf_ref[0, :, k] = jnp.where(keep, zmin, -1.0)
            qv_ref[0, :, k] = jnp.where(keep, sel_q, -1.0)
            # retire the selected candidate for each pixel
            zwork = jnp.where(cand_ids == amin[:, None], _BIG, zwork)

    return kernel


@partial(jax.jit, static_argnames=("T", "K", "S", "nt",
                                   "depth_merging_threshold", "interpret"))
def rasterize_fine_pallas(cand_px, cand_py, cand_z, ea, eb, ec, rx, ry,
                          cut, ok, *, T: int, K: int, S: int, nt: int,
                          depth_merging_threshold: float,
                          interpret: bool = False):
    """Run the fine kernel over all tiles of one cloud.

    Args: candidate arrays (n_tiles, M) gathered by the coarse stage
    (indices LOCAL to the candidate list — the caller maps back).
    Returns (idx_local (n_tiles, T², K), zbuf, qvalue, occ (n_tiles, T²)).
    """
    n_tiles, M = cand_px.shape
    kernel = _fine_kernel(T, M, K, S, nt, depth_merging_threshold)
    # inputs carried as (n_tiles, 1, M): TPU block mapping requires the
    # last two block dims to equal the array dims (sublane constraint)
    spec_in = pl.BlockSpec((1, 1, M), lambda i: (i, 0, 0),
                           memory_space=pltpu.VMEM)
    out_shapes = (
        jax.ShapeDtypeStruct((n_tiles, T * T, K), jnp.int32),
        jax.ShapeDtypeStruct((n_tiles, T * T, K), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, T * T, K), jnp.float32),
        jax.ShapeDtypeStruct((n_tiles, 1, T * T), jnp.float32),
    )
    out_specs = (
        pl.BlockSpec((1, T * T, K), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T * T, K), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, T * T, K), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 1, T * T), lambda i: (i, 0, 0),
                     memory_space=pltpu.VMEM),
    )
    ins = [a[:, None, :] for a in
           (cand_px, cand_py, cand_z, ea, eb, ec, rx, ry, cut,
            ok.astype(jnp.float32))]
    idx, zbuf, qv, occ = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[spec_in] * 10,
        out_shape=out_shapes,
        out_specs=out_specs,
        interpret=interpret,
    )(*ins)
    return idx, zbuf, qv, occ[:, 0, :]
