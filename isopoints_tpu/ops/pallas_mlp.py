"""Pallas fused SDF-MLP kernels (TPU).

The SDF MLP is THE hot op: sphere tracing / Newton projection / dense
sampling evaluate it tens of times per ray (SURVEY.md §3 hot loops
A–C). Under plain XLA every layer is a separate matmul kernel — L HBM
round-trips of the (N, hidden) activations per evaluation. This module
fuses the whole MLP into ONE Pallas kernel: the weight stack stays
resident in VMEM (a 3×256 SIREN is ~0.8 MB) and activations never
leave VMEM; rays stream through in tiles.

Input gradients (needed by Newton projection, eikonal, normals) are
computed in the SAME kernel by forward-mode: each tile carries 3
tangent columns through the layers (J ← (J·Wᵀ)⊙act'(z)), so
`value_and_grad` costs one fused pass instead of forward + backward —
a TPU-first replacement for the reference's autograd.grad calls
(levelset_sampling.py:142-170). The tangents live as a LIST of three
(T, H) arrays, never a (T, 3, H) tensor — a middle dim of 3 pads to
the (8, 128) TPU tile and cost 4.3x (51 -> 12 ms per 524k value+grad
eval when switching to the 2D-list form; see _make_mmg).

Measured on TPU v5e, 4-layer 256-wide IGR, 524k-point batches
(amortized over a 20-eval scan; ~30 ms/dispatch tunnel latency
excluded):

  mode       value dots                 value      value+grad
  'bf16'     1-pass bf16                4.8 ms     9.0 ms   (~1e-3 val err)
  'f32x3'    3-pass bf16 decomposition  7.7 ms    11.9 ms   (default)
  'highest'  6-pass (Precision.HIGHEST) slowest — strict-parity mode

64k Newton projections at the 5e-5 training tolerance: 3.6M proj/s at
100% convergence with 'f32x3'; 'bf16' plateaus at its ~1e-3 rounding
noise (9% convergence) — never use it for Newton.

TPU matmuls at DEFAULT precision truncate f32 inputs to bf16 — the SDF
value then carries ~1e-3 absolute noise and can never meet the 5e-5
Newton/tracing tolerances. 'f32x3' splits each f32 operand into
bf16 hi+lo parts (a ≈ a_hi + a_lo) and computes
a·b ≈ a_hi·b_hi + a_hi·b_lo + a_lo·b_hi — three one-pass MXU dots with
f32 accumulation, ~2^-21 relative error (Mosaic does not lower
jax.lax.Precision.HIGH, so the decomposition is explicit; weight
hi/lo parts are pre-split host-side). Tangent (gradient) dots stay
1-pass bf16 in every mode: Newton only tests the VALUE against the
tolerance, and quadratic convergence is robust to a 0.4%-accurate
step direction.

Supports the SIREN (sin, ω-scaled) and IGR (softplus β=100, skip at
layer k with /√2) architectures of models/fields.py. Falls back to the
reference jax implementation off-TPU (pallas interpret mode in tests).
"""

import functools
import math
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from isopoints_tpu.models.fields import SDFField, SirenField

_TILE = 1024  # rays per kernel instance (sublane-friendly multiple of 8)

_MODES = ("bf16", "f32x3", "highest")


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _split_hi_lo(w: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """f32 -> (hi, lo) bf16 parts with w ≈ hi + lo."""
    hi = w.astype(jnp.bfloat16)
    lo = (w - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _make_mm(mode: str):
    """Value-path matmul: a (f32) @ weight-ref-tuple -> f32."""
    if mode == "bf16":
        def mm(a, wref):
            return jnp.dot(a.astype(jnp.bfloat16), wref[0][:],
                           preferred_element_type=jnp.float32)
    elif mode == "f32x3":
        def mm(a, wref):
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            w_hi, w_lo = wref[0][:], wref[1][:]
            dot = functools.partial(jnp.dot,
                                    preferred_element_type=jnp.float32)
            return dot(a_hi, w_hi) + dot(a_hi, w_lo) + dot(a_lo, w_hi)
    else:  # highest
        def mm(a, wref):
            return jnp.dot(a, wref[0][:],
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    return mm


def _make_mmg(mode: str):
    """Tangent-path matmul: one (T, H_in) @ w -> (T, H_out) per tangent.

    The three input tangents are carried as a LIST of (T, H) arrays —
    never a (T, 3, H) tensor: a middle dim of 3 pads to the (8, 128)
    TPU tile, wasting 2.7x on every elementwise op and forcing layout
    changes around each dot (measured 51 -> 12 ms per 524k value+grad
    eval when switching to the 2D-list form). 1-pass bf16 in
    'bf16'/'f32x3' (see module docstring); HIGHEST in 'highest' (the
    strict-parity mode).
    """
    if mode in ("bf16", "f32x3"):
        def mmg(a, wref):
            return jnp.dot(a.astype(jnp.bfloat16), wref[0][:],
                           preferred_element_type=jnp.float32)
    else:
        def mmg(a, wref):
            return jnp.dot(a, wref[0][:].astype(jnp.float32),
                           preferred_element_type=jnp.float32,
                           precision=jax.lax.Precision.HIGHEST)
    return mmg


def _pack_weights(ws: Sequence[jax.Array], bs: Sequence[jax.Array],
                  mode: str) -> Tuple[List[jax.Array], int]:
    """Host-side weight prep. Returns (flat mats, refs-per-layer).

    Layout per layer: 'f32x3' -> (w_hi, w_lo, b); else (w, b).
    Weights stored (in, out); biases 2D (1, out) for TPU layout.
    """
    mats: List[jax.Array] = []
    for w, b in zip(ws, bs):
        wt = jnp.asarray(w).T
        if mode == "f32x3":
            hi, lo = _split_hi_lo(wt)
            mats.extend([hi, lo])
        elif mode == "bf16":
            mats.append(wt.astype(jnp.bfloat16))
        else:
            mats.append(wt)
        mats.append(jnp.asarray(b)[None, :])
    return mats, (3 if mode == "f32x3" else 2)


def _resolve_mode(bf16: Optional[bool], precision: Optional[str]) -> str:
    if precision is not None:
        assert precision in _MODES, precision
        return precision
    if bf16:
        return "bf16"
    return "f32x3"


def _make_igr_forward(n_layers: int, skip_in: Tuple[int, ...],
                      final_tanh: bool, mode: str, stride: int):
    """Value-only IGR forward: x (T, D) -> (T, out) against packed wrefs.

    Same stack as _igr_kernel's value path, reusable inside OTHER
    kernels (the fused ray sampler marches this per step). `stride` is
    the PACKING stride, which may exceed the mode's needs: a 'bf16'
    forward over f32x3-packed refs reads only the hi part — exactly
    the trace precision schedule's coarse sweep."""
    beta = 100.0
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    mm = _make_mm(mode)

    def forward(x, wrefs):
        layer = lambda l: (wrefs[stride * l:stride * (l + 1) - 1],
                           wrefs[stride * (l + 1) - 1])
        h = x
        for l in range(n_layers):
            if l in skip_in:
                h = jnp.concatenate([h, x], axis=-1) * inv_sqrt2
            wref, b = layer(l)
            z = mm(h, wref) + b[:]
            h = jax.nn.softplus(beta * z) / beta if l < n_layers - 1 else z
        return jnp.tanh(h) if final_tanh else h

    return forward


def _make_siren_forward(n_hidden: int, first_omega: float,
                        hidden_omega: float, mode: str, stride: int):
    """Value-only SIREN forward: x (T, 3) -> (T, out). See
    _make_igr_forward for the stride-vs-mode contract."""
    mm = _make_mm(mode)
    sin_f = jnp.sin if mode == "highest" else _sin_fast

    def forward(x, wrefs):
        layer = lambda l: (wrefs[stride * l:stride * (l + 1) - 1],
                           wrefs[stride * (l + 1) - 1])
        wref0, b0 = layer(0)
        h = sin_f(first_omega * (mm(x, wref0) + b0[:]))
        for l in range(n_hidden):
            wref, b = layer(1 + l)
            h = sin_f(hidden_omega * (mm(h, wref) + b[:]))
        wref, b = layer(1 + n_hidden)
        return mm(h, wref) + b[:]

    return forward


# ---------------------------------------------------------------------------
# SIREN variant
# ---------------------------------------------------------------------------

_TWO_PI_HI = 6.28125                    # Cody-Waite split of 2π: the
_TWO_PI_LO = 1.9353071795864769e-03     # hi part is exact in 9 bits

# near-minimax odd/even polynomials for sin/cos on [-π, π], fitted on
# Chebyshev nodes (max abs err 9.6e-8 / 1.1e-8). Mosaic's hardware
# sin/cos lowering costs ~12 ms of a 19 ms 524k-point SIREN eval; the
# polynomial pair brings the kernel to 8.3 ms at 5.7e-7 end-to-end
# error vs the hardware-sin kernel (both are approximations of exact
# sin — the SDF tracing/projection tolerance is 5e-5).
_SIN_C = (9.9999959990e-01, -1.6666552631e-01, 8.3324029612e-03,
          -1.9808632624e-04, 2.6997138282e-06, -2.0362212135e-08)
_COS_C = (9.9999998905e-01, -4.9999989101e-01, 4.1666489214e-02,
          -1.3887803571e-03, 2.4769882914e-05, -2.7079024322e-07,
          1.7245068538e-09)


def _range_reduce(x):
    """x -> r in [-π, π] with x = r (mod 2π), Cody-Waite two-constant
    reduction (exact k·hi subtraction keeps f32 precision for the
    |ω·z| ≲ 100 arguments SIREN produces)."""
    k = jnp.round(x * (1.0 / (2.0 * math.pi)))
    return (x - k * _TWO_PI_HI) - k * _TWO_PI_LO


def _poly_eval(r2, coefs):
    acc = coefs[-1]
    for c in coefs[-2::-1]:
        acc = acc * r2 + c
    return acc


def _sin_fast(x):
    r = _range_reduce(x)
    return r * _poly_eval(r * r, _SIN_C)


def _sincos_fast(x):
    """Fused sin+cos sharing one range reduction (the tangent path
    needs both of the same argument)."""
    r = _range_reduce(x)
    r2 = r * r
    return r * _poly_eval(r2, _SIN_C), _poly_eval(r2, _COS_C)


def _siren_kernel(n_layers: int, first_omega: float, hidden_omega: float,
                  with_grad: bool, mode: str, stride: int):
    """Kernel body for a SIREN stack. Weight refs come per layer as
    (w[, w_lo], b) groups of `stride` refs (see _pack_weights).

    'bf16'/'f32x3' use the polynomial sin/cos (above); 'highest' (the
    strict-parity mode) keeps the hardware transcendentals."""
    mm = _make_mm(mode)
    mmg = _make_mmg(mode)
    if mode == "highest":
        sin_f = jnp.sin
        sincos_f = lambda x: (jnp.sin(x), jnp.cos(x))
    else:
        sin_f = _sin_fast
        sincos_f = _sincos_fast

    def kernel(x_ref, *refs):
        if with_grad:
            out_ref, grad_ref = refs[-2], refs[-1]
            wrefs = refs[:-2]
        else:
            out_ref = refs[-1]
            wrefs = refs[:-1]
        layer = lambda l: (wrefs[stride * l:stride * (l + 1) - 1],
                           wrefs[stride * (l + 1) - 1])

        x = x_ref[:]                                   # (T, 3)
        wref0, b0 = layer(0)
        z = mm(x, wref0) + b0[:]
        if with_grad:
            h, cz = sincos_f(first_omega * z)
            # tangents: list of 3 (T, H) arrays (see _make_mmg). At the
            # first layer each is ω₀·cos(ω₀z)·W0[k] (e_k @ W0 = row k).
            w0 = wref0[0][:].astype(jnp.float32)       # (3, H)
            dh = first_omega * cz
            jac = [dh * w0[k:k + 1, :] for k in range(3)]
        else:
            h = sin_f(first_omega * z)

        for l in range(n_layers):
            wref, b = layer(1 + l)
            z = mm(h, wref) + b[:]
            if with_grad:
                h, cz = sincos_f(hidden_omega * z)
                dh = hidden_omega * cz
                jac = [dh * mmg(j, wref) for j in jac]
            else:
                h = sin_f(hidden_omega * z)

        wref, b = layer(1 + n_layers)
        out = mm(h, wref) + b[:]  # (T, 1)
        out_ref[:] = out
        if with_grad:
            grad_ref[:] = jnp.concatenate(
                [mmg(j, wref) for j in jac], axis=-1)        # (T, 3)

    return kernel


def make_fused_siren_sdf(field: SirenField, params: Dict,
                         interpret: Optional[bool] = None,
                         bf16: Optional[bool] = None,
                         precision: Optional[str] = None
                         ) -> Tuple[Callable, Callable]:
    """Build fused (sdf_fn, sdf_and_grad_fn) for a SIREN field.

    Returns:
      sdf(x): (..., 3) -> (...,)
      sdf_and_grad(x): (..., 3) -> ((...,), (..., 3))
    Both jit-compatible; weights are closed over as constants of the
    pallas_call (donated to VMEM by the pipeline). `precision` in
    {'bf16','f32x3','highest'}; default 'f32x3' (module docstring).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mode = _resolve_mode(bf16, precision)
    layers = params["layers"]
    n_hidden = field.n_layers
    assert field.out_dim == 1, "fused path supports sdf-only heads"
    mats, stride = _pack_weights([lp["w"] for lp in layers],
                                 [lp["b"] for lp in layers], mode)

    def run(x_flat, with_grad: bool):
        n = x_flat.shape[0]
        n_pad = _round_up(max(n, 1), _TILE)
        xp = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(x_flat)
        grid = (n_pad // _TILE,)
        kernel = _siren_kernel(n_hidden, field.first_omega_0,
                               field.hidden_omega_0, with_grad, mode, stride)
        w_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for m in mats]
        out_shapes = [jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)]
        out_specs = [pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        if with_grad:
            out_shapes.append(jax.ShapeDtypeStruct((n_pad, 3), jnp.float32))
            out_specs.append(pl.BlockSpec((_TILE, 3), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((_TILE, 3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + w_specs,
            out_shape=tuple(out_shapes) if with_grad else out_shapes[0],
            out_specs=tuple(out_specs) if with_grad else out_specs[0],
            interpret=interpret,
        )(xp, *mats)
        if with_grad:
            return res[0][:n, 0], res[1][:n]
        return res[:n, 0]

    def sdf(x):
        shp = x.shape[:-1]
        v = run(x.reshape(-1, 3), with_grad=False)
        return v.reshape(shp)

    def sdf_and_grad(x):
        shp = x.shape[:-1]
        v, g = run(x.reshape(-1, 3), with_grad=True)
        return v.reshape(shp), g.reshape(*shp, 3)

    # let fields.sdf_and_grad dispatch to the fused gradient path
    sdf.sdf_and_grad = sdf_and_grad
    # in-kernel dense ray sampler (RayTracingConfig.sampler_in_kernel)
    from isopoints_tpu.ops import pallas_sampler, pallas_trace
    sdf.fused_ray_sampler = pallas_sampler.make_sampler(
        "siren", field, mats, stride, mode, interpret)
    # in-kernel fused-backstep marching (RayTracingConfig.trace_in_kernel)
    sdf.fused_trace_stepper = pallas_trace.make_trace_stepper(
        "siren", field, mats, stride, mode, interpret)
    return sdf, sdf_and_grad


def make_fused_sdf_fn(field, params, interpret: Optional[bool] = None,
                      bf16: Optional[bool] = None,
                      precision: Optional[str] = None) -> Optional[Callable]:
    """Fused callable for a supported field, or None.

    Supported: SirenField with a pure-sdf head; SDFField with
    num_frequencies=0. The returned callable carries `.sdf_and_grad`.

    Default precision 'f32x3': f32-accurate values (the 5e-5
    tracing/projection tolerances are meaningful) at 3-pass MXU cost.
    'bf16' trades ~1e-3 absolute SDF error for 1-pass speed —
    acceptable only for coarse marching, never for Newton projection
    (the convergence mask plateaus at the rounding noise: measured
    10.7% convergence at 5e-5).
    """
    try:
        if (isinstance(field, SirenField) and field.out_dim == 1
                and field.activation is None and field.outermost_linear
                and field.c_dim == 0):
            return make_fused_siren_sdf(field, params, interpret, bf16=bf16,
                                        precision=precision)[0]
        if isinstance(field, SDFField) and field.num_frequencies <= 0 \
                and field.out_dim == 1:
            return make_fused_igr_sdf(field, params, interpret, bf16=bf16,
                                      precision=precision)[0]
    except AssertionError:
        return None
    return None


# ---------------------------------------------------------------------------
# IGR / DeepSDF variant (softplus β=100, skip connections, tanh head)
# ---------------------------------------------------------------------------

def _igr_kernel(n_layers: int, skip_in: Tuple[int, ...], final_tanh: bool,
                with_grad: bool, mode: str, stride: int):
    """Kernel body for the IGR stack (weight-norm folded host-side;
    num_frequencies=0 — positional encoding stays on the jax path)."""
    beta = 100.0
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def act(z):
        return jax.nn.softplus(beta * z) / beta

    def dact(z):
        return jax.nn.sigmoid(beta * z)

    mm = _make_mm(mode)
    mmg = _make_mmg(mode)

    def kernel(x_ref, *refs):
        if with_grad:
            out_ref, grad_ref = refs[-2], refs[-1]
            wrefs = refs[:-2]
        else:
            out_ref = refs[-1]
            wrefs = refs[:-1]
        layer = lambda l: (wrefs[stride * l:stride * (l + 1) - 1],
                           wrefs[stride * (l + 1) - 1])

        x = x_ref[:]                                   # (T, D)
        d_in = x.shape[-1]
        t = x.shape[0]
        h = x

        def one_hot(k):
            col = jax.lax.broadcasted_iota(jnp.int32, (t, d_in), 1)
            return (col == k).astype(jnp.float32)

        if with_grad:
            # tangents: list of 3 (T, width) arrays (see _make_mmg);
            # input jac = e_k (D == 3 for the raw path)
            jac = [one_hot(k) for k in range(d_in)]

        for l in range(n_layers):
            if l in skip_in:
                h = jnp.concatenate([h, x], axis=-1) * inv_sqrt2
                if with_grad:
                    jac = [jnp.concatenate([jac[k], one_hot(k)],
                                           axis=-1) * inv_sqrt2
                           for k in range(d_in)]
            wref, b = layer(l)
            z = mm(h, wref) + b[:]
            if with_grad:
                jz = [mmg(j, wref) for j in jac]
            if l < n_layers - 1:
                h = act(z)
                if with_grad:
                    d = dact(z)
                    jac = [d * j for j in jz]
            else:
                h = z
                if with_grad:
                    jac = jz
        if final_tanh:
            if with_grad:
                d = 1.0 - jnp.tanh(h) ** 2
                jac = [d * j for j in jac]
            h = jnp.tanh(h)
        out_ref[:] = h
        if with_grad:
            grad_ref[:] = jnp.concatenate(jac, axis=-1)      # (T, 3)

    return kernel


def make_fused_igr_sdf(field: SDFField, params: Dict,
                       interpret: Optional[bool] = None,
                       bf16: Optional[bool] = None,
                       precision: Optional[str] = None
                       ) -> Tuple[Callable, Callable]:
    """Fused (sdf, sdf_and_grad) for an IGR SDFField.

    Requires num_frequencies=0 (raw xyz input); weight-norm is folded
    into plain weights host-side (w = g·v/|v|_row). `precision` in
    {'bf16','f32x3','highest'}; default 'f32x3'."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    mode = _resolve_mode(bf16, precision)
    assert field.num_frequencies <= 0, \
        "fused IGR path requires num_frequencies=0"
    assert field.out_dim == 1
    layers = params["layers"]
    n_layers = len(layers)
    ws, bs = [], []
    for lp in layers:
        if "v" in lp:
            v, g = lp["v"], lp["g"]
            w = v * (g / jnp.maximum(
                jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12))
        else:
            w = lp["w"]
        ws.append(w)
        bs.append(lp["b"])
    mats, stride = _pack_weights(ws, bs, mode)

    def run(x_flat, with_grad: bool):
        n = x_flat.shape[0]
        n_pad = _round_up(max(n, 1), _TILE)
        xp = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(x_flat)
        grid = (n_pad // _TILE,)
        kernel = _igr_kernel(n_layers, field.skip_in, field.final_tanh,
                             with_grad, mode, stride)
        w_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0),
                                memory_space=pltpu.VMEM) for m in mats]
        out_shapes = [jax.ShapeDtypeStruct((n_pad, 1), jnp.float32)]
        out_specs = [pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                                  memory_space=pltpu.VMEM)]
        if with_grad:
            out_shapes.append(jax.ShapeDtypeStruct((n_pad, 3), jnp.float32))
            out_specs.append(pl.BlockSpec((_TILE, 3), lambda i: (i, 0),
                                          memory_space=pltpu.VMEM))
        res = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[pl.BlockSpec((_TILE, 3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + w_specs,
            out_shape=tuple(out_shapes) if with_grad else out_shapes[0],
            out_specs=tuple(out_specs) if with_grad else out_specs[0],
            interpret=interpret,
        )(xp, *mats)
        if with_grad:
            return res[0][:n, 0], res[1][:n]
        return res[:n, 0]

    def sdf(x):
        shp = x.shape[:-1]
        return run(x.reshape(-1, 3), with_grad=False).reshape(shp)

    def sdf_and_grad(x):
        shp = x.shape[:-1]
        v, g = run(x.reshape(-1, 3), with_grad=True)
        return v.reshape(shp), g.reshape(*shp, 3)

    sdf.sdf_and_grad = sdf_and_grad
    from isopoints_tpu.ops import pallas_sampler, pallas_trace
    sdf.fused_ray_sampler = pallas_sampler.make_sampler(
        "igr", field, mats, stride, mode, interpret)
    sdf.fused_trace_stepper = pallas_trace.make_trace_stepper(
        "igr", field, mats, stride, mode, interpret)
    return sdf, sdf_and_grad
