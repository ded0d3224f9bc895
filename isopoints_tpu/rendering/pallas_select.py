"""Pallas splat candidate-selection kernel (TPU).

Replaces the coarse stage of the tiled rasterizer — the strip+tile
`top_k` sorts in `rasterizer._tile_candidates` (the reference's analog
is the CUDA binning pass building per-bin point lists,
rasterize_points.cu:213-290) — with an exact sort-free selection that
runs entirely in VMEM:

  1. **Integer bisection for the capacity threshold.** Depths are
     bitcast to int32 (monotonic for the non-negative floats the
     z >= 0 filter guarantees); 31 halving steps find the exact k-th
     smallest depth among the splats overlapping a strip (or tile),
     where k = min(capacity, overlap count). No sort — just masked
     counts, which vectorize perfectly on the VPU.
  2. **Prefix-sum compaction via triangular dots.** Each selected
     splat's output slot is its exclusive prefix count, computed as
     `flags @ LT` with LT[i,j] = (i < j) built from iota compares —
     an MXU matmul instead of the TPU-hostile cumsum/scatter.
  3. **One-hot extraction dots.** Candidate attributes land in their
     slots through `attrs @ onehot(slot)` products (exact: each output
     element receives exactly one addend; dots run at HIGHEST
     precision so f32 payloads — including indices up to 2^24 —
     survive bit-exactly).

Selection semantics match `lax.top_k` on -z EXACTLY as a set: splats
strictly in front of the threshold all qualify; capacity left at the
threshold depth is filled in index order, which is `top_k`'s own
tie-break. Candidate-list ORDER differs (threshold groups in index
order instead of depth order), but every downstream consumer —
the fine kernel's masked-min sweeps (slot-order tie-break == index
order among equal depths on both paths), the tile-level zbuf backward,
and the visibility scatter — is order-insensitive, so fragment maps
are bit-identical (tests/test_pallas_select.py asserts this).

Depth packing through the f32 extraction dots: int32 depth bits split
into hi = zi >> 12 (19 bits) and lo = zi & 0xfff (12 bits), both exact
in f32, reconstructed in-kernel for the tile-level bisection.

Measured (TPU v5e, 24.5k splats / 512px / strip 1280 / tile 256): the
XLA strip+tile top_k selection costs ~11.3 ms/frame; this kernel
replaces it (see PERF.md for the r4 numbers).
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_IMAX = 2**31 - 1  # python int: jnp constants would be captured consts
_HI = jax.lax.Precision.HIGHEST


def _dot_nt(a, b):
    """a (m, L) x b (n, L) -> (m, n), contracting the lane axes.

    HIGHEST precision: the one-hot extraction payloads (attributes,
    indices, depth-bit halves) must come through bit-exact.
    """
    return jax.lax.dot_general(
        a, b, (((1,), (1,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32)


def _dot_nn(a, b):
    """a (m, L) x b (L, n) -> (m, n) at HIGHEST precision."""
    return jax.lax.dot_general(
        a, b, (((1,), (0,)), ((), ())),
        precision=_HI, preferred_element_type=jnp.float32)


def _select_kernel(P: int, L: int, R: int, M: int, nt: int, T: int,
                   S: int, half: float):
    nblk = P // L
    t_f = float(T)

    def kernel(attf_ref, atti_ref, cidx_ref, cok_ref, ovf_ref):
        g = pl.program_id(0)
        # strip center y from the pixel-center NDC convention
        # ndc(row) = (S - 2*row - 1)/S: midpoint of rows [gT, gT+T)
        cy = (S - 2.0 * jax.lax.convert_element_type(g, jnp.float32)
              * t_f - t_f) / S

        def strip_mask(b):
            py = attf_ref[b, 1:2, :]                      # (1, L)
            ry = attf_ref[b, 3:4, :]
            valid = atti_ref[b, 1:2, :] > 0
            return (jnp.abs(py - cy) <= ry + half) & valid

        def zi_masked(b, sok):
            zi = atti_ref[b, 0:1, :]                      # (1, L)
            return jnp.where(sok, zi, jnp.int32(_IMAX))

        # --- strip phase: count, threshold, compact ------------------
        count_s = jnp.zeros((), jnp.int32)
        for b in range(nblk):
            count_s += jnp.sum(strip_mask(b).astype(jnp.int32))
        k_s = jnp.minimum(jnp.int32(R), count_s)

        def bisect_body(_, lohi):
            lo, hi = lohi
            mid = lo + (hi - lo) // 2
            c = jnp.zeros((), jnp.int32)
            for b in range(nblk):
                zi = zi_masked(b, strip_mask(b))
                c += jnp.sum((zi <= mid).astype(jnp.int32))
            take = c >= k_s
            return (jnp.where(take, lo, mid + 1),
                    jnp.where(take, mid, hi))
        # v_s = exact k_s-th smallest masked depth (31 halvings cover
        # the non-negative int32 lattice)
        _, v_s = jax.lax.fori_loop(
            0, 31, bisect_body,
            (jnp.zeros((), jnp.int32), jnp.full((), _IMAX, jnp.int32)))

        n_strict = jnp.zeros((), jnp.int32)
        for b in range(nblk):
            zi = zi_masked(b, strip_mask(b))
            n_strict += jnp.sum((zi < v_s).astype(jnp.int32))
        n_take_tie = k_s - n_strict

        # exclusive-prefix triangle (i < j) for the compaction dots
        lt = (jax.lax.broadcasted_iota(jnp.int32, (L, L), 0)
              < jax.lax.broadcasted_iota(jnp.int32, (L, L), 1)
              ).astype(jnp.float32)
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (2, L), 0)
        iota_r = jax.lax.broadcasted_iota(jnp.int32, (R, L), 0)

        # fori_loop (NOT an unrolled python loop): each iteration's
        # (R, L) one-hot is 2.6 MB of scoped-VMEM stack; unrolled,
        # Mosaic allocates them per-block and blows the 16 MB limit
        def acc_body(b, acc_carry):
            acc, carry = acc_carry
            sok = strip_mask(b)
            zi = zi_masked(b, sok)
            strict = zi < v_s                              # (1, L)
            tie = zi == v_s
            sel2 = jnp.where(rows2 == 0, strict.astype(jnp.float32),
                             tie.astype(jnp.float32))      # (2, L)
            pfx = _dot_nn(sel2, lt) + carry                # (2, L)
            carry = carry + jnp.sum(sel2, axis=1, keepdims=True)
            pfx_s = pfx[0:1, :].astype(jnp.int32)
            pfx_t = pfx[1:2, :].astype(jnp.int32)
            taken = strict | (tie & (pfx_t < n_take_tie))
            slot = jnp.where(strict, pfx_s, n_strict + pfx_t)
            oh = ((iota_r == slot) & taken).astype(jnp.float32)  # (R, L)

            # attribute rows for the extraction dot: px, rx, depth-bit
            # halves, global index
            px = attf_ref[b, 0:1, :]
            rx = attf_ref[b, 2:3, :]
            ziu = atti_ref[b, 0:1, :]
            zhi = (ziu >> 12).astype(jnp.float32)
            zlo = (ziu & 0xFFF).astype(jnp.float32)
            gidx = (jax.lax.broadcasted_iota(jnp.int32, (1, L), 1)
                    + b * L).astype(jnp.float32)
            rows8 = jax.lax.broadcasted_iota(jnp.int32, (8, L), 0)
            att8 = jnp.where(rows8 == 0, px, 0.0)
            att8 = jnp.where(rows8 == 1, rx, att8)
            att8 = jnp.where(rows8 == 2, zhi, att8)
            att8 = jnp.where(rows8 == 3, zlo, att8)
            att8 = jnp.where(rows8 == 4, gidx, att8)
            return acc + _dot_nt(att8, oh), carry          # (8, R)

        acc, _ = jax.lax.fori_loop(
            0, nblk, acc_body,
            (jnp.zeros((8, R), jnp.float32), jnp.zeros((2, 1), jnp.float32)))

        # --- tile phase on the compacted strip list ------------------
        spx = acc[0:1, :]                                  # (1, R)
        srx = acc[1:2, :]
        szi = (acc[2:3, :].astype(jnp.int32) * 4096
               + acc[3:4, :].astype(jnp.int32))
        sidx = acc[4:5, :]
        s_ok = jax.lax.broadcasted_iota(jnp.int32, (1, R), 1) < k_s
        szi = jnp.where(s_ok, szi, jnp.int32(_IMAX))

        tj = jax.lax.broadcasted_iota(jnp.int32, (nt, R), 0)
        cx = (S - 2.0 * tj.astype(jnp.float32) * t_f - t_f) / S
        ov = (jnp.abs(spx - cx) <= srx + half) & s_ok      # (nt, R)
        count_t = jnp.sum(ov.astype(jnp.int32), axis=1,
                          keepdims=True)                   # (nt, 1)
        k_t = jnp.minimum(jnp.int32(M), count_t)
        ziw = jnp.where(ov, szi, jnp.int32(_IMAX))

        def tbisect_body(_, lohi):
            lo, hi = lohi
            mid = lo + (hi - lo) // 2
            c = jnp.sum((ziw <= mid).astype(jnp.int32), axis=1,
                        keepdims=True)
            take = c >= k_t
            return (jnp.where(take, lo, mid + 1),
                    jnp.where(take, mid, hi))
        _, v_t = jax.lax.fori_loop(
            0, 31, tbisect_body,
            (jnp.zeros((nt, 1), jnp.int32),
             jnp.full((nt, 1), _IMAX, jnp.int32)))

        strict_t = ziw < v_t                               # (nt, R)
        tie_t = ziw == v_t
        n_strict_t = jnp.sum(strict_t.astype(jnp.int32), axis=1,
                             keepdims=True)
        n_take_t = k_t - n_strict_t

        sel2t = jnp.concatenate([strict_t.astype(jnp.float32),
                                 tie_t.astype(jnp.float32)], axis=0)
        # blocked exclusive prefix along R (static lane slices)
        Lr = min(256, R)
        assert R % Lr == 0
        ltr = (jax.lax.broadcasted_iota(jnp.int32, (Lr, Lr), 0)
               < jax.lax.broadcasted_iota(jnp.int32, (Lr, Lr), 1)
               ).astype(jnp.float32)
        carry_t = jnp.zeros((2 * nt, 1), jnp.float32)
        pfx_parts = []
        for rb in range(R // Lr):
            blk = sel2t[:, rb * Lr:(rb + 1) * Lr]
            pfx_parts.append(_dot_nn(blk, ltr) + carry_t)
            carry_t = carry_t + jnp.sum(blk, axis=1, keepdims=True)
        pfx_all = jnp.concatenate(pfx_parts, axis=1)       # (2nt, R)
        pfx_st = pfx_all[:nt, :].astype(jnp.int32)
        pfx_tt = pfx_all[nt:, :].astype(jnp.int32)
        taken_t = strict_t | (tie_t & (pfx_tt < n_take_t))
        slot_t = jnp.where(strict_t, pfx_st, n_strict_t + pfx_tt)

        # fori_loop for the same scoped-VMEM reason as acc_body: each
        # (M, R) one-hot is 1.3 MB; 32 unrolled copies OOM the stack.
        # Mosaic has no dynamic_slice on VALUES, so row t of the
        # (nt, R) slot/taken tables is selected by a one-hot row dot
        # (exact: slots <= R << 2^24; taken is 0/1)
        iota_m = jax.lax.broadcasted_iota(jnp.int32, (M, R), 0)
        iota_nt = jax.lax.broadcasted_iota(jnp.int32, (1, nt), 1)
        slot_f = slot_t.astype(jnp.float32)                # (nt, R)
        takslot_f = jnp.where(taken_t, slot_f, -1.0)       # -1 = not taken

        def extract_body(t, _):
            rowsel = (iota_nt == t).astype(jnp.float32)    # (1, nt)
            srow = _dot_nn(rowsel, takslot_f)              # (1, R)
            oh_t = (iota_m == srow.astype(jnp.int32)).astype(jnp.float32)
            # srow == -1 (not taken) matches no slot in [0, M)
            cidx_t = _dot_nt(sidx, oh_t)                   # (1, M)
            cidx_ref[0, pl.ds(t, 1), :] = cidx_t.astype(jnp.int32)
            return 0

        jax.lax.fori_loop(0, nt, extract_body, 0)
        iota_ok = jax.lax.broadcasted_iota(jnp.int32, (nt, M), 1)
        cok_ref[0, :, :] = (iota_ok < k_t).astype(jnp.int32)

        # scalar stores don't lower to VMEM on TPU — write a (1, 1)
        ovf = (jnp.maximum(count_s - jnp.int32(R), 0)
               + jnp.sum(jnp.maximum(count_t - jnp.int32(M), 0)))
        ovf_ref[0, :, :] = jnp.broadcast_to(ovf, (1, 1))

    return kernel


@partial(jax.jit, static_argnames=("S", "T", "nt", "R", "M", "interpret"))
def select_candidates_pallas(px, py, z, rx, ry, valid, *, S: int, T: int,
                             nt: int, R: int, M: int,
                             interpret: bool = False):
    """Per-tile front-most candidate selection for one cloud.

    Args: per-splat (P,) arrays; `valid` must already include the
    z >= 0 filter (the bitcast depth order needs non-negative floats).
    R = strip capacity (`max_points_per_strip`, or any value >= P to
    disable strip narrowing), M = tile capacity (`max_points_per_tile`).

    Returns (cand_idx (nt*nt, M) int32, cand_ok (nt*nt, M) bool,
    overflow () int32) — the same contract as the XLA
    `_tile_candidates` rows stacked over strips: identical candidate
    SETS (threshold-exact, `top_k` index tie-break), index-grouped
    order (see module docstring).
    """
    P = px.shape[0]
    L = 512 if P >= 512 else 128
    p_pad = -(-P // L) * L
    half = float(T - 1) / S
    r_eff = min(R if R else p_pad, p_pad)
    m_eff = min(M, p_pad)

    def pad(a, fill=0.0):
        return jnp.full((p_pad,), fill, a.dtype).at[:P].set(a)

    zi = jax.lax.bitcast_convert_type(
        jnp.where(valid, z, 0.0).astype(jnp.float32), jnp.int32)
    rows8 = jnp.arange(8)
    attf = jnp.zeros((p_pad // L, 8, L), jnp.float32)
    atti = jnp.zeros((p_pad // L, 8, L), jnp.int32)
    blkd = lambda a: a.reshape(p_pad // L, 1, L)
    attf = attf.at[:, 0:1].set(blkd(pad(px.astype(jnp.float32))))
    attf = attf.at[:, 1:2].set(blkd(pad(py.astype(jnp.float32))))
    attf = attf.at[:, 2:3].set(blkd(pad(rx.astype(jnp.float32))))
    attf = attf.at[:, 3:4].set(blkd(pad(ry.astype(jnp.float32))))
    atti = atti.at[:, 0:1].set(blkd(pad(zi)))
    atti = atti.at[:, 1:2].set(blkd(pad(valid.astype(jnp.int32))))
    del rows8

    kernel = _select_kernel(p_pad, L, r_eff, m_eff, nt, T, S, half)
    nblk = p_pad // L
    full = lambda shp: pl.BlockSpec(shp, lambda i: (0,) * len(shp),
                                    memory_space=pltpu.VMEM)
    cidx, cok, ovf = pl.pallas_call(
        kernel,
        grid=(nt,),
        in_specs=[full((nblk, 8, L)), full((nblk, 8, L))],
        out_shape=(
            jax.ShapeDtypeStruct((nt, nt, m_eff), jnp.int32),
            jax.ShapeDtypeStruct((nt, nt, m_eff), jnp.int32),
            jax.ShapeDtypeStruct((nt, 1, 1), jnp.int32),
        ),
        out_specs=(
            pl.BlockSpec((1, nt, m_eff), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, nt, m_eff), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(attf, atti)
    return (cidx.reshape(nt * nt, m_eff), cok.reshape(nt * nt, m_eff) > 0,
            ovf.sum())
