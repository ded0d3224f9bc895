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
(levelset_sampling.py:142-170).

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

_TILE = 512  # rays per kernel instance (sublane-friendly multiple of 8)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


def _siren_kernel(n_layers: int, first_omega: float, hidden_omega: float,
                  with_grad: bool, bf16: bool = False):
    """Kernel body for a SIREN stack. Weight refs come in layer order:
    w0, b0, w1, b1, ..., w_out, b_out. Weights are stored (in, out)."""
    cast = (lambda a: a.astype(jnp.bfloat16)) if bf16 else (lambda a: a)

    def mm(a, b):
        return jnp.dot(cast(a), cast(b), preferred_element_type=jnp.float32)

    def mm3(a, b):
        # (T, 3, H_in) @ (H_in, H_out): Mosaic cannot lower the batched
        # bf16 dot (3D reshape), so unroll the 3 tangent columns into
        # plain 2D matmuls
        if bf16:
            cols = [jnp.dot(cast(a[:, k, :]), cast(b),
                            preferred_element_type=jnp.float32)
                    for k in range(a.shape[1])]
            return jnp.stack(cols, axis=1)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def kernel(x_ref, *refs):
        if with_grad:
            out_ref, grad_ref = refs[-2], refs[-1]
            wrefs = refs[:-2]
        else:
            out_ref = refs[-1]
            wrefs = refs[:-1]

        x = x_ref[:]                                   # (T, 3)
        w0 = wrefs[0][:]
        b0 = wrefs[1][:]
        z = mm(x, w0) + b0
        h = jnp.sin(first_omega * z)
        if with_grad:
            # J: (T, 3, H) tangent of h wrt the 3 inputs
            jac = first_omega * jnp.cos(first_omega * z)[:, None, :] * \
                w0[None, :, :]

        for l in range(n_layers):
            w = wrefs[2 + 2 * l][:]
            b = wrefs[3 + 2 * l][:]
            z = mm(h, w) + b
            if with_grad:
                jz = mm3(jac, w)
                jac = hidden_omega * jnp.cos(hidden_omega * z)[:, None, :] * jz
            h = jnp.sin(hidden_omega * z)

        w = wrefs[-2][:]
        b = wrefs[-1][:]
        out = mm(h, w) + b  # (T, 1)
        out_ref[:] = out
        if with_grad:
            jout = mm3(jac, w)                               # (T, 3, 1)
            grad_ref[:] = jout[..., 0]

    return kernel


def make_fused_siren_sdf(field: SirenField, params: Dict,
                         interpret: Optional[bool] = None,
                         bf16: bool = False) -> Tuple[Callable, Callable]:
    """Build fused (sdf_fn, sdf_and_grad_fn) for a SIREN field.

    Returns:
      sdf(x): (..., 3) -> (...,)
      sdf_and_grad(x): (..., 3) -> ((...,), (..., 3))
    Both jit-compatible; weights are closed over as constants of the
    pallas_call (donated to VMEM by the pipeline).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    layers = params["layers"]
    n_hidden = field.n_layers
    assert field.out_dim == 1, "fused path supports sdf-only heads"
    # transpose to (in, out) once, host-side
    mats: List[jax.Array] = []
    for lp in layers:
        mats.append(jnp.asarray(lp["w"]).T)
        mats.append(jnp.asarray(lp["b"])[None, :])      # 2D for TPU layout

    def run(x_flat, with_grad: bool):
        n = x_flat.shape[0]
        n_pad = _round_up(max(n, 1), _TILE)
        xp = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(x_flat)
        grid = (n_pad // _TILE,)
        kernel = _siren_kernel(n_hidden, field.first_omega_0,
                               field.hidden_omega_0, with_grad, bf16=bf16)
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
    return sdf, sdf_and_grad


def make_fused_sdf_fn(field, params, interpret: Optional[bool] = None,
                      bf16: Optional[bool] = None) -> Optional[Callable]:
    """Fused callable for a supported field, or None.

    Supported: SirenField with a pure-sdf head; SDFField with
    num_frequencies=0. The returned callable carries `.sdf_and_grad`.
    bf16 defaults ON on TPU only: there it is bit-identical to the
    default-precision path (see _igr_kernel docstring) at 1.67x the
    throughput; on CPU (interpret mode) true-f32 matmuls would lose
    precision from the cast, so it stays off.
    """
    if bf16 is None:
        bf16 = jax.default_backend() == "tpu"
    try:
        if (isinstance(field, SirenField) and field.out_dim == 1
                and field.activation is None and field.outermost_linear
                and field.c_dim == 0):
            return make_fused_siren_sdf(field, params, interpret, bf16=bf16)[0]
        if isinstance(field, SDFField) and field.num_frequencies <= 0 \
                and field.out_dim == 1:
            return make_fused_igr_sdf(field, params, interpret, bf16=bf16)[0]
    except AssertionError:
        return None
    return None


# ---------------------------------------------------------------------------
# IGR / DeepSDF variant (softplus β=100, skip connections, tanh head)
# ---------------------------------------------------------------------------

def _igr_kernel(n_layers: int, skip_in: Tuple[int, ...], final_tanh: bool,
                with_grad: bool, bf16: bool = False):
    """Kernel body for the IGR stack (weight-norm folded host-side;
    num_frequencies=0 — positional encoding stays on the jax path).

    With `bf16`, matmul INPUTS are cast explicitly to bfloat16 (f32
    accumulate). MEASURED on TPU v5e (4-layer 256-wide, 4.2M points):
    11.8M value+grad evals/s default -> 19.7M with bf16=True (1.67x),
    with BIT-IDENTICAL outputs — XLA's default matmul precision on TPU
    already truncates f32 inputs to bf16 per pass, so the explicit cast
    only removes input-handling overhead, not precision. (For true f32
    numerics one would need precision=HIGHEST, which the plain
    models/fields.py path uses; the tracing pipelines tolerate default
    precision — the reference runs them in f32 CUDA but the convergence
    oracles here hold, see tests.)
    """
    beta = 100.0
    inv_sqrt2 = 1.0 / math.sqrt(2.0)

    def act(z):
        return jax.nn.softplus(beta * z) / beta

    def dact(z):
        return jax.nn.sigmoid(beta * z)

    cast = (lambda a: a.astype(jnp.bfloat16)) if bf16 else (lambda a: a)

    def mm(a, b):
        return jnp.dot(cast(a), cast(b), preferred_element_type=jnp.float32)

    def mm3(a, b):
        # (T, 3, H_in) @ (H_in, H_out): Mosaic cannot lower the batched
        # bf16 dot (3D reshape), so unroll the 3 tangent columns into
        # plain 2D matmuls
        if bf16:
            cols = [jnp.dot(cast(a[:, k, :]), cast(b),
                            preferred_element_type=jnp.float32)
                    for k in range(a.shape[1])]
            return jnp.stack(cols, axis=1)
        return jax.lax.dot_general(
            a, b, dimension_numbers=(((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    def kernel(x_ref, *refs):
        if with_grad:
            out_ref, grad_ref = refs[-2], refs[-1]
            wrefs = refs[:-2]
        else:
            out_ref = refs[-1]
            wrefs = refs[:-1]

        x = x_ref[:]                                   # (T, D)
        d_in = x.shape[-1]
        h = x
        if with_grad:
            # J: (T, 3, width); input jac = I (D == 3 for the raw path)
            eye = jax.lax.broadcasted_iota(jnp.int32, (d_in, d_in), 0) == \
                jax.lax.broadcasted_iota(jnp.int32, (d_in, d_in), 1)
            jac = jnp.broadcast_to(eye.astype(jnp.float32),
                                   (x.shape[0], d_in, d_in))

        for l in range(n_layers):
            if l in skip_in:
                h = jnp.concatenate([h, x], axis=-1) * inv_sqrt2
                if with_grad:
                    eye = jax.lax.broadcasted_iota(
                        jnp.int32, (d_in, d_in), 0) == jax.lax.broadcasted_iota(
                        jnp.int32, (d_in, d_in), 1)
                    jx = jnp.broadcast_to(eye.astype(jnp.float32),
                                          (x.shape[0], d_in, d_in))
                    jac = jnp.concatenate([jac, jx], axis=-1) * inv_sqrt2
            w = wrefs[2 * l][:]
            b = wrefs[2 * l + 1][:]
            z = mm(h, w) + b
            if with_grad:
                jz = mm3(jac, w)
            if l < n_layers - 1:
                h = act(z)
                if with_grad:
                    jac = dact(z)[:, None, :] * jz
            else:
                h = z
                if with_grad:
                    jac = jz
        if final_tanh:
            if with_grad:
                jac = (1.0 - jnp.tanh(h) ** 2)[:, None, :] * jac
            h = jnp.tanh(h)
        out_ref[:] = h
        if with_grad:
            grad_ref[:] = jac[..., 0]

    return kernel


def make_fused_igr_sdf(field: SDFField, params: Dict,
                       interpret: Optional[bool] = None,
                       bf16: bool = False) -> Tuple[Callable, Callable]:
    """Fused (sdf, sdf_and_grad) for an IGR SDFField.

    Requires num_frequencies=0 (raw xyz input); weight-norm is folded
    into plain weights host-side (w = g·v/|v|_row)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    assert field.num_frequencies <= 0, \
        "fused IGR path requires num_frequencies=0"
    assert field.out_dim == 1
    layers = params["layers"]
    n_layers = len(layers)
    mats: List[jax.Array] = []
    for lp in layers:
        if "v" in lp:
            v, g = lp["v"], lp["g"]
            w = v * (g / jnp.maximum(
                jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12))
        else:
            w = lp["w"]
        mats.append(jnp.asarray(w).T)
        mats.append(jnp.asarray(lp["b"])[None, :])

    def run(x_flat, with_grad: bool):
        n = x_flat.shape[0]
        n_pad = _round_up(max(n, 1), _TILE)
        xp = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(x_flat)
        grid = (n_pad // _TILE,)
        kernel = _igr_kernel(n_layers, field.skip_in, field.final_tanh,
                             with_grad, bf16=bf16)
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
    return sdf, sdf_and_grad
