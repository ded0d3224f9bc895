"""In-kernel sphere-trace marching (TPU Pallas).

The compacted fine marching stages are the costliest part of the bench
trace (measured 72 ms of 128 ms at 262k rays — scripts/
probe_trace_stages.py): each `body_fused` while_loop iteration is one
fused-MLP pallas_call plus a full-width pass of XLA elementwise state
updates and an any()-reduction for the loop condition, and every stage
boundary re-gathers ten state arrays. This kernel marches a FIXED
number of fused-backstep iterations (RayTracingConfig.fused_backstep
semantics, models/raytracing.py::body_fused) entirely in VMEM: per-ray
state lives in a fori_loop carry, both fronts are evaluated in one
batched (2T)-row pass per iteration, and only the 10 per-ray state
scalars touch HBM once per stage.

Compatibility: the per-iteration math is the SAME ops in the SAME
order as body_fused + eval_pair (x = cam + t·dir, concat fronts,
identical matmul decomposition); a fixed iteration count equals the
while_loop because finished rays (un=0 ⇒ bk=0) take zero-length moves
— extra iterations are identity. Outputs agree with the XLA loop to
f32 dot-reduction roundoff (~1e-6/eval; backends may block the (2T)-
row in-kernel dot differently from the fused fn's 1024-row tiles),
bounded well under the 5e-5 trace threshold — see TestInKernelTrace.
"""

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isopoints_tpu.ops import pallas_mlp as _pm

# smaller tile than the flat MLP kernel: every (T, 1) per-ray state
# vector tiles to (T, 128) in VMEM (lane padding), and this kernel
# holds 10 input blocks + 10 output blocks + a 10-vector fori carry —
# at T=1024 that alone is ~16 MB and Mosaic runs out of VMEM stack.
# T=256 keeps the per-iteration dot at a healthy (2T=512)-row shape
# while the state tiles drop to 131 KB each.
_TILE = 256


def _march_kernel(fwd: Callable, n_iters: int, thr: float,
                  line_search_step: float, line_step_iters: int,
                  gate_end_front: bool):
    """Refs: (cam, dirs, acc_s, acc_e, sdf_s, sdf_e, un_s, un_e,
    bk_s, bk_e, cur_s, cur_e, *weights, <same 10 state outputs>)."""

    def kernel(cam_ref, dir_ref, *refs):
        outs = refs[-10:]
        state_in = refs[:10]
        wrefs = refs[10:-10]
        cam = cam_ref[:]                                  # (T, 3)
        dirs = dir_ref[:]                                 # (T, 3)
        t = cam.shape[0]
        scl = 1.0 - line_search_step

        def body(_, s):
            # masks are carried as int32 (Mosaic cannot legalize i1
            # vectors in an scf.for carry) and rebuilt as bools here
            (acc_s, acc_e, sdf_s, sdf_e, un_s_i, un_e_i,
             bk_s, bk_e, cur_s, cur_e) = s
            un_s = un_s_i != 0
            un_e = un_e_i != 0
            fwd_s = jnp.where(un_s & (bk_s == 0) & (sdf_s > thr), sdf_s, 0.0)
            fwd_e = jnp.where(un_e & (bk_e == 0) & (sdf_e > thr), sdf_e, 0.0)
            scale_s = scl * jnp.exp2(-(bk_s - 1).astype(jnp.float32))
            scale_e = scl * jnp.exp2(-(bk_e - 1).astype(jnp.float32))
            move_s = jnp.where(bk_s > 0, -scale_s * cur_s, fwd_s)
            move_e = jnp.where(bk_e > 0, -scale_e * cur_e, fwd_e)
            acc_s = acc_s + move_s
            acc_e = acc_e - move_e
            # both fronts in ONE batched eval (eval_pair parity)
            x2 = jnp.concatenate(
                [cam + acc_s * dirs, cam + acc_e * dirs], axis=0)
            f2 = fwd(x2, wrefs)                           # (2T, 1)
            new_s, new_e = f2[:t], f2[t:]

            may_s = un_s & (new_s < 0) & (bk_s < line_step_iters)
            may_e = un_e & (new_e < 0) & (bk_e < line_step_iters)
            cur_s = jnp.where(may_s & (bk_s == 0), fwd_s, cur_s)
            cur_e = jnp.where(may_e & (bk_e == 0), fwd_e, cur_e)
            bk_s = jnp.where(may_s, bk_s + 1, 0)
            bk_e = jnp.where(may_e, bk_e + 1, 0)

            not_crossed = acc_s < acc_e
            un_s = un_s & ((bk_s > 0) | ((new_s > thr) & not_crossed))
            un_e = un_e & ((bk_e > 0) | ((new_e > thr) & not_crossed))
            if gate_end_front:
                un_e = un_e & (un_s | (bk_e > 0))
            return (acc_s, acc_e, new_s, new_e,
                    un_s.astype(jnp.int32), un_e.astype(jnp.int32),
                    bk_s, bk_e, cur_s, cur_e)

        init = tuple(r[:] for r in state_in)
        s = jax.lax.fori_loop(0, n_iters, body, init)
        for i, o in enumerate(outs):
            o[:] = s[i]

    return kernel


def make_trace_stepper(kind: str, field, mats: Sequence[jax.Array],
                       stride: int, mode: str, interpret: bool) -> Callable:
    """Build the in-kernel marching callable for an already-packed
    weight stack (attached as `.fused_trace_stepper` by
    make_fused_{igr,siren}_sdf).

    stepper(cam (..., 3), dirs (..., 3), state10, n_iters, thr,
            line_search_step, line_step_iters, gate_end_front)
      -> state10'

    state10 = (acc_s, acc_e, sdf_s, sdf_e, un_s, un_e, bk_s, bk_e,
    cur_s, cur_e) with un_* bool and bk_* int32, all shaped (...).
    Marches `n_iters` fused-backstep iterations at this fn's own
    precision (models/raytracing.py::body_fused semantics).
    """
    if kind == "igr":
        fwd = _pm._make_igr_forward(len(mats) // stride, field.skip_in,
                                    field.final_tanh, mode, stride)
    elif kind == "siren":
        fwd = _pm._make_siren_forward(field.n_layers, field.first_omega_0,
                                      field.hidden_omega_0, mode, stride)
    else:  # pragma: no cover
        raise ValueError(kind)
    w_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for m in mats]

    def stepper(cam, dirs, state10, n_iters: int, thr: float,
                line_search_step: float, line_step_iters: int,
                gate_end_front: bool):
        shp = state10[0].shape
        cam2 = jnp.broadcast_to(cam, dirs.shape)
        cam2 = cam2.reshape(-1, 3).astype(jnp.float32)
        drs = dirs.reshape(-1, 3).astype(jnp.float32)
        n = cam2.shape[0]
        n_pad = _pm._round_up(max(n, 1), _TILE)

        def pad(a, dt, w=1):
            a = a.reshape(-1, w).astype(dt)
            return jnp.zeros((n_pad, w), dt).at[:n].set(a)

        dts = [jnp.float32] * 4 + [jnp.int32] * 4 + [jnp.float32] * 2
        flat = [pad(s, dt) for s, dt in zip(state10, dts)]
        kernel = _march_kernel(fwd, int(n_iters), float(thr),
                               float(line_search_step),
                               int(line_step_iters), bool(gate_end_front))
        ray_spec = lambda w: pl.BlockSpec((_TILE, w), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM)
        outs = pl.pallas_call(
            kernel,
            grid=(n_pad // _TILE,),
            in_specs=[ray_spec(3), ray_spec(3)] + [ray_spec(1)] * 10
            + w_specs,
            out_shape=tuple(jax.ShapeDtypeStruct((n_pad, 1), dt)
                            for dt in dts),
            out_specs=tuple(ray_spec(1) for _ in range(10)),
            interpret=interpret,
        )(pad(cam2, jnp.float32, 3), pad(drs, jnp.float32, 3),
          *flat, *mats)
        res = [outs[i][:n, 0].reshape(shp) for i in range(10)]
        res[4] = res[4] != 0
        res[5] = res[5] != 0
        return tuple(res)

    return stepper
