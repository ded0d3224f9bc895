"""Fused in-kernel dense ray sampler (TPU Pallas).

The IDR dense sampler (reference RayTracing.ray_sampler,
levelset_sampling.py:1034-1112) sweeps `n_steps` uniform proposals per
ray, picks the first sign change, fine-revalidates the bracket and
refines it with a secant. Done in XLA that costs three full passes of
(rays × n_steps) state through HBM — ~29 MB of proposal points plus
the f-values and two argmin/gather rounds for a 24.5k-ray frame — on
top of the MLP evals themselves (measured ~45 ms of a 135 ms trace,
round-2 PERF.md).

This kernel marches the sweep INSIDE the fused SDF-MLP kernel instead:
the weight stack is VMEM-resident, each step's proposal points are
built in registers (cam + t·dir), and the per-ray running state
(first-crossing pick, bracket, argmin) lives in the fori_loop carry —
nothing of size (rays × n_steps) ever exists. The bracket
re-validation (2 fine evals) and the whole secant (n_secant fine
evals) run in the SAME kernel, so the sampler costs exactly its MLP
evals plus one (rays × 4)-scalar output.

Semantics are EXACTLY `models/raytracing._dense_ray_sampler`'s
(equivalence-tested): the sweep runs at the coarse (1-pass bf16)
precision when `coarse_sweep=True` — reading the hi half of the same
f32x3-packed weights the fine path uses, which is bit-identical to
`make_fused_*_sdf(..., precision='bf16')` of the same params — and the
first-crossing pick carries the hysteresis `margin`
(RayTracingConfig.sampler_coarse_margin).

Outputs per ray: (t_pick, f_pick_fine, t_min, z_secant); the cheap
(rays,)-sized hit/fallback selection stays in XLA at the call site.
"""

import functools
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isopoints_tpu.ops import pallas_mlp as _pm
from isopoints_tpu.utils import eps_denom

# rays per kernel instance: 512 keeps the kernel's scoped VMEM well
# under the 16 MB limit in every context — at 1024 the sweep carry +
# lane-padded (T, 1) state + the (2T, 256) revalidation activations
# measured 16.37 MB when compiled inside the sharded train step (the
# bench-alone build sat just under the line)
_TILE = 512


def _sweep_kernel(fwd_sweep: Callable, fwd_fine: Callable, n_steps: int,
                  n_secant: int, margin: float, revalidate: bool):
    """Kernel body. Refs: (steps, cam, dir, t_lo, t_hi, *weights,
    t_pick, f_pick, t_min, z_secant)."""

    def kernel(steps_ref, cam_ref, dir_ref, tlo_ref, thi_ref, *refs):
        t_pick_ref, f_pick_ref, t_min_ref, z_sec_ref = refs[-4:]
        wrefs = refs[:-4]
        cam = cam_ref[:]                                   # (T, 3)
        dirs = dir_ref[:]                                  # (T, 3)
        tlo = tlo_ref[:]                                   # (T, 1)
        span = thi_ref[:] - tlo
        t = cam.shape[0]
        inf = jnp.full((t, 1), jnp.inf, jnp.float32)
        zero = jnp.zeros((t, 1), jnp.float32)

        def body(s, carry):
            (best_cost, t_pick, f_pick, z_low, f_low, prev_t, prev_f,
             f_min, t_min) = carry
            t_s = tlo + steps_ref[0, s] * span             # (T, 1)
            f_s = fwd_sweep(cam + t_s * dirs, wrefs)       # (T, 1)
            # first-sign-change pick = argmin of sign(f+margin)·countdown
            # (raytracing.py:_dense_ray_sampler; reference :1061-1063).
            # Strict < keeps the FIRST minimum, matching argmin.
            countdown = jnp.float32(n_steps) - s.astype(jnp.float32)
            cost = jnp.sign(f_s + margin) * countdown
            # bracket low end: idx_lo = max(idx - 1, 0)
            p_t = jnp.where(s == 0, t_s, prev_t)
            p_f = jnp.where(s == 0, f_s, prev_f)
            upd = cost < best_cost
            best_cost = jnp.where(upd, cost, best_cost)
            t_pick = jnp.where(upd, t_s, t_pick)
            f_pick = jnp.where(upd, f_s, f_pick)
            z_low = jnp.where(upd, p_t, z_low)
            f_low = jnp.where(upd, p_f, f_low)
            umin = f_s < f_min
            f_min = jnp.where(umin, f_s, f_min)
            t_min = jnp.where(umin, t_s, t_min)
            return (best_cost, t_pick, f_pick, z_low, f_low, t_s, f_s,
                    f_min, t_min)

        init = (inf, zero, zero, zero, zero, zero, zero, inf, zero)
        carry = jax.lax.fori_loop(0, n_steps, body, init)
        _, t_pick, f_pick, z_low, f_low, _, _, _, t_min = carry

        if revalidate:
            # fine re-validation of the bracket endpoints: the hit
            # decision and the secant must not rest on coarse values
            # (one batched 2T-row pass instead of two T-row passes)
            x2 = jnp.concatenate(
                [cam + z_low * dirs, cam + t_pick * dirs], axis=0)
            f2 = fwd_fine(x2, wrefs)                       # (2T, 1)
            f_low, f_pick = f2[:t], f2[t:]

        # fixed-step secant (raytracing.py:_secant_scan semantics)
        def z_pred(fl, fh, zl, zh):
            return -fl * (zh - zl) / eps_denom(fh - fl, 1e-12) + zl

        def sec(_, c):
            fl, fh, zl, zh = c
            z = z_pred(fl, fh, zl, zh)
            f_mid = fwd_fine(cam + z * dirs, wrefs)
            low = f_mid > 0
            high = f_mid < 0
            return (jnp.where(low, f_mid, fl), jnp.where(high, f_mid, fh),
                    jnp.where(low, z, zl), jnp.where(high, z, zh))

        fl, fh, zl, zh = jax.lax.fori_loop(
            0, n_secant, sec, (f_low, f_pick, z_low, t_pick))
        z_sec_ref[:] = z_pred(fl, fh, zl, zh)
        t_pick_ref[:] = t_pick
        f_pick_ref[:] = f_pick
        t_min_ref[:] = t_min

    return kernel


def make_sampler(kind: str, field, mats: Sequence[jax.Array], stride: int,
                 mode: str, interpret: bool) -> Callable:
    """Build the fused ray-sampler callable for an already-packed
    weight stack (called by make_fused_{igr,siren}_sdf, which attach it
    as `.fused_ray_sampler` on the fused sdf fn).

    The returned callable:

        sampler(cam_loc (..., 3), ray_dirs (..., 3), t_lo (...),
                t_hi (...), steps (S,), n_secant=8, margin=0.0,
                coarse_sweep=False)
          -> (t_pick, f_pick, t_min, z_secant), each shaped (...)

    `steps` are the per-ray step FRACTIONS of [t_lo, t_hi] (uniform
    linspace for the dense sampler; the random stratification of
    _minimal_sdf_points works too). The sweep runs at this fn's own
    precision, or 1-pass bf16 when `coarse_sweep` (f32x3 packing only —
    other packings keep coarse == fine, the documented identity case);
    bracket + secant always run at the fn's precision.
    """
    coarse_mode = "bf16" if stride == 3 else mode
    if kind == "igr":
        n_layers = len(mats) // stride
        mk = functools.partial(_pm._make_igr_forward, n_layers,
                               field.skip_in, field.final_tanh)
    elif kind == "siren":
        mk = functools.partial(_pm._make_siren_forward, field.n_layers,
                               field.first_omega_0, field.hidden_omega_0)
    else:  # pragma: no cover
        raise ValueError(kind)
    fwd_fine = mk(mode, stride)
    fwd_coarse = mk(coarse_mode, stride)
    w_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for m in mats]

    def sampler(cam_loc, ray_dirs, t_lo, t_hi, steps, n_secant: int = 8,
                margin: float = 0.0, coarse_sweep: bool = False):
        shp = t_lo.shape
        cam = jnp.broadcast_to(cam_loc, ray_dirs.shape)
        cam = cam.reshape(-1, 3).astype(jnp.float32)
        drs = ray_dirs.reshape(-1, 3).astype(jnp.float32)
        tlo = t_lo.reshape(-1, 1).astype(jnp.float32)
        thi = t_hi.reshape(-1, 1).astype(jnp.float32)
        n_rays = tlo.shape[0]
        n_pad = _pm._round_up(max(n_rays, 1), _TILE)

        def pad(a):
            return jnp.zeros((n_pad, a.shape[1]), jnp.float32).at[
                :n_rays].set(a)

        steps2 = jnp.asarray(steps, jnp.float32)[None, :]   # (1, S)
        n_steps = steps2.shape[1]
        kernel = _sweep_kernel(fwd_coarse if coarse_sweep else fwd_fine,
                               fwd_fine, n_steps, int(n_secant),
                               float(margin), bool(coarse_sweep))
        grid = (n_pad // _TILE,)
        ray_spec = lambda w: pl.BlockSpec((_TILE, w), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((1, n_steps), lambda i: (0, 0),
                                   memory_space=pltpu.SMEM),
                      ray_spec(3), ray_spec(3), ray_spec(1), ray_spec(1)
                      ] + w_specs,
            out_shape=tuple(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)
                            for _ in range(4)),
            out_specs=tuple(ray_spec(1) for _ in range(4)),
            interpret=interpret,
        )(steps2, pad(cam), pad(drs), pad(tlo), pad(thi), *mats)
        unflat = lambda a: a[:n_rays, 0].reshape(shp)
        return tuple(unflat(o) for o in outs)

    # callers (raytracing._dense_ray_sampler) check this before taking
    # the in-kernel path with coarse_sweep=True: the bf16 coarse sweep
    # only matches the caller's sdf_fn_coarse for f32x3 packing
    sampler.packing_stride = stride
    return sampler
