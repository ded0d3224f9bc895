"""Pallas occupancy-backward kernel (TPU) — the DSS xy-gradient.

Computes the reference's production backward semantics
(rasterize_points_backward.cu:99-178: for every pixel with grad_occ≠0
within the per-cloud search radius of a visible point, accumulate
(pixel−point)/dist²·grad_occ with the positive-grad/outside-splat
gate) as a single VMEM-resident kernel:

  * the grad_occ image stays in VMEM as overlapping 128-wide COLUMN
    strips every 64 columns (the lane dim cannot be dynamically
    sliced, but a strip index is a leading dim — dynamically
    indexable; the search-radius clamp guarantees a point's whole
    column window fits one strip, so the result is exactly the
    full-row computation's). Strips cost ~2× image VMEM and cut the
    per-point band from (W+8, S) to (W+8, 128): 13.7 -> 5.9 ms at
    24.5k points / 512 px,
  * each point reads an 8-aligned (W+8, BW) row band around its pixel
    row (sublane-dynamic slices must start at multiples of 8),
  * per-point scalars arrive via scalar prefetch (SMEM),
  * results are written 8 points at a time (8-aligned stores).

vs the XLA formulation (rasterizer._occ_backward_one): that one
gathers (N, W, W) patches and streams every intermediate through HBM —
measured 30.4 ms vs 13.7 ms for this kernel at 24.5k points / 512px
(exact agreement, 1e-7 relative summation noise).

Falls back to interpret mode off-TPU (tests compare it against the
XLA path as oracle).
"""

from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_PT = 512  # points per grid instance


def occ_backward_pallas_one(pts: jax.Array, radii: jax.Array,
                            visible: jax.Array, grad_occ: jax.Array,
                            settings,
                            interpret: Optional[bool] = None) -> jax.Array:
    """One cloud: (P, 3) ndc points, (P, 2) radii, (P,) visibility,
    (S, S) occupancy grad -> (P, 2) xy gradient.

    Drop-in equal to rasterizer._occ_backward_one (same search-radius
    setup, same eps_denom guard, same window gates). Requires the
    image size to be a multiple of 8.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    s = settings
    Simg = s.image_size
    assert Simg % 8 == 0, "pallas occ backward needs S % 8 == 0"
    Wb = min(s.backward_patch_pixels, Simg)
    WB = min(Wb + 8, Simg)
    rs = s.radii_backward_scaler

    px, py, z = pts[:, 0], pts[:, 1], pts[:, 2]
    rx, ry = radii[:, 0], radii[:, 1]
    renderable = visible & (z >= 0) & (jnp.abs(px) <= 1.0) & \
        (jnp.abs(py) <= 1.0)

    # per-cloud search radius: median of visible radii × scaler,
    # clamped so the (pre-alignment) band covers the window
    # (rasterizer.py:884 + _occ_backward_one)
    r_flat = jnp.where(renderable[:, None], radii, jnp.nan).reshape(-1)
    search_r = jnp.nan_to_num(jnp.nanmedian(r_flat), nan=1e-3) * rs
    if Wb < Simg:
        search_r = jnp.minimum(search_r, (Wb / 2.0 - 2.0) * 2.0 / Simg)
    search_r2 = search_r * search_r

    # band start: point pixel row − Wb/2, clipped, rounded DOWN to a
    # multiple of 8 (Mosaic requires statically-8-aligned sublane
    # starts); the +8 band rows keep the original window covered
    row_f = jnp.nan_to_num((Simg * (1.0 - py) - 1.0) * 0.5)
    r0 = jnp.clip(jnp.round(row_f).astype(jnp.int32) - Wb // 2,
                  0, Simg - Wb)
    r0 = jnp.minimum((r0 // 8) * 8, Simg - WB)

    # column strips: BW-wide every 64 cols. The in-kernel column cut is
    # dist² ≤ sr², so |Δcol| ≤ sr_px ≤ Wb/2 − 2 (the clamp above) —
    # choosing the strip at floor((col − Wb/2)/64)·64 always covers the
    # whole window (BW ≥ Wb + 64), making the strip cut a no-op.
    BW = Simg
    if Simg % 64 == 0:
        BW = min(Simg, ((Wb + 64 + 127) // 128) * 128)
    nb = (Simg - BW) // 64 + 1
    col_f = jnp.nan_to_num((Simg * (1.0 - px) - 1.0) * 0.5)
    if nb > 1:
        bsel = jnp.clip((jnp.round(col_f).astype(jnp.int32) - Wb // 2)
                        // 64, 0, nb - 1)
    else:
        bsel = jnp.zeros_like(r0)
    gblocks = jnp.stack([grad_occ[:, 64 * b:64 * b + BW]
                         for b in range(nb)])            # (nb, S, BW)

    n = pts.shape[0]
    n_pad = ((n + _PT - 1) // _PT) * _PT
    padf = lambda a: jnp.zeros((n_pad,), a.dtype).at[:n].set(a)
    ok_p = jnp.zeros((n_pad,), jnp.int32).at[:n].set(
        renderable.astype(jnp.int32))

    def kernel(r0_s, b_s, px_s, py_s, rx_s, ry_s, ok_s, sr2_s,
               grad_ref, gx_ref, gy_ref):
        ti = pl.program_id(0)
        sr2 = sr2_s[0]
        cols = jax.lax.broadcasted_iota(jnp.int32, (1, BW), 1)

        def one_point(gidx):
            r0v = pl.multiple_of(r0_s[gidx], 8)
            bs = b_s[gidx]
            band = grad_ref[bs, pl.dslice(r0v, WB), :]      # (WB, BW)
            acols = 64 * bs + cols
            xrow = (Simg - 2.0 * acols.astype(jnp.float32) - 1.0) / Simg
            dx = xrow - px_s[gidx]                          # (1, BW)
            rows = r0v + jax.lax.broadcasted_iota(jnp.int32, (WB, 1), 0)
            ys = (Simg - 2.0 * rows.astype(jnp.float32) - 1.0) / Simg
            dy = ys - py_s[gidx]                            # (WB, 1)
            dist2 = dx * dx + dy * dy                       # (WB, S)
            outside = (jnp.abs(dx) > rx_s[gidx]) | \
                (jnp.abs(dy) > ry_s[gidx])
            use = (dist2 <= sr2) & (band != 0.0) & (ok_s[gidx] > 0) & \
                ~((band > 0.0) & outside)
            denom = jnp.maximum(dist2, 1e-10)   # eps_denom on dist2 >= 0
            gx = jnp.sum(jnp.where(use, dx / denom * band, 0.0))
            gy = jnp.sum(jnp.where(use, dy / denom * band, 0.0))
            return gx, gy

        def body(i8, _):
            # 8 points per iteration: stores must start 8-aligned
            base = ti * _PT + i8 * 8
            outs = [one_point(base + j) for j in range(8)]
            gx_ref[pl.dslice(i8 * 8, 8), :] = jnp.stack(
                [o[0] for o in outs])[:, None]
            gy_ref[pl.dslice(i8 * 8, 8), :] = jnp.stack(
                [o[1] for o in outs])[:, None]
            return 0

        jax.lax.fori_loop(0, _PT // 8, body, 0)

    grid = (n_pad // _PT,)
    gx, gy = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=8,
            grid=grid,
            in_specs=[pl.BlockSpec((nb, Simg, BW), lambda i, *_: (0, 0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=[pl.BlockSpec((_PT, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((_PT, 1), lambda i, *_: (i, 0),
                                    memory_space=pltpu.VMEM)],
        ),
        out_shape=(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)),
        interpret=interpret,
    )(padf(r0), padf(bsel), padf(px), padf(py), padf(rx), padf(ry), ok_p,
      jnp.full((1,), search_r2, jnp.float32), gblocks)
    return jnp.concatenate([gx[:n], gy[:n]], axis=-1).astype(pts.dtype)
