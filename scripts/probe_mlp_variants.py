"""Fused-MLP kernel variants microbench (VERDICT r2 item 6: attack the
44% MXU ceiling). Times value and value+grad at 524k points on the
real TPU, for the shipped kernel and experimental variants:

  batched-tangents: the 3 per-layer tangent dots as ONE (3T, H) dot
  kcat-f32x3: the 3-pass f32x3 value dot as ONE K-concatenated dot
              (sum-over-K equivalence: [a_hi a_hi a_lo] @
              [w_hi; w_lo; w_hi])

  python scripts/probe_mlp_variants.py
"""

import functools
import math
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

from isopoints_tpu.models.fields import SDFField
from isopoints_tpu.ops import pallas_mlp as pm

N = 524_288
REP = 10
_TILE = 1024


def timeit(f, x):
    out = f(x)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        out = f(x)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / REP)
    return best


def scan_rep(fn):
    @jax.jit
    def wrapped(x):
        def step(carry, _):
            out = fn(x + 1e-30 * carry)
            leaves = jax.tree_util.tree_leaves(out)
            return leaves[0].astype(jnp.float32).mean(), None
        c, _ = jax.lax.scan(step, jnp.float32(0), None, length=REP)
        return c
    return wrapped


def igr_kernel_batched_tangents(n_layers, skip_in, final_tanh, mode, stride):
    """_igr_kernel with_grad=True, but the 3 input tangents ride as one
    (3T, H) array through the layers: one tangent dot per layer."""
    beta = 100.0
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    mm = pm._make_mm(mode)
    mmg = pm._make_mmg(mode)

    def kernel(x_ref, *refs):
        out_ref, grad_ref = refs[-2], refs[-1]
        wrefs = refs[:-2]
        layer = lambda l: (wrefs[stride * l:stride * (l + 1) - 1],
                           wrefs[stride * (l + 1) - 1])
        x = x_ref[:]
        d_in = x.shape[-1]
        t = x.shape[0]
        h = x
        col = jax.lax.broadcasted_iota(jnp.int32, (3 * t, d_in), 1)
        row = jax.lax.broadcasted_iota(jnp.int32, (3 * t, d_in), 0)
        jac = (col == row // t).astype(jnp.float32)       # (3T, D)
        x3 = jnp.concatenate([x, x, x], axis=0)

        for l in range(n_layers):
            if l in skip_in:
                h = jnp.concatenate([h, x], axis=-1) * inv_sqrt2
                jc = jac  # (3T, H)
                eye3 = (jax.lax.broadcasted_iota(
                    jnp.int32, (3 * t, d_in), 1)
                    == jax.lax.broadcasted_iota(
                        jnp.int32, (3 * t, d_in), 0) // t
                ).astype(jnp.float32)
                jac = jnp.concatenate([jc, eye3], axis=-1) * inv_sqrt2
            wref, b = layer(l)
            z = mm(h, wref) + b[:]
            jz = mmg(jac, wref)                           # ONE (3T,·) dot
            if l < n_layers - 1:
                h = jax.nn.softplus(beta * z) / beta
                d = jax.nn.sigmoid(beta * z)              # (T, H)
                jac = jnp.concatenate([d, d, d], axis=0) * jz
            else:
                h = z
                jac = jz
        if final_tanh:
            dt = 1.0 - jnp.tanh(h) ** 2
            jac = jnp.concatenate([dt, dt, dt], axis=0) * jac
            h = jnp.tanh(h)
        out_ref[:] = h
        grad_ref[:] = jnp.concatenate(
            [jac[:t], jac[t:2 * t], jac[2 * t:]], axis=-1)  # (T, 3)

    return kernel


def run_batched(field, params, mode="f32x3"):
    layers = params["layers"]
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
    mats, stride = pm._pack_weights(ws, bs, mode)
    kernel = igr_kernel_batched_tangents(len(layers), field.skip_in,
                                         field.final_tanh, mode, stride)
    w_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for m in mats]

    def f(x):
        n = x.shape[0]
        n_pad = pm._round_up(n, _TILE)
        xp = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(x)
        return pl.pallas_call(
            kernel,
            grid=(n_pad // _TILE,),
            in_specs=[pl.BlockSpec((_TILE, 3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + w_specs,
            out_shape=(jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
                       jax.ShapeDtypeStruct((n_pad, 3), jnp.float32)),
            out_specs=(pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM),
                       pl.BlockSpec((_TILE, 3), lambda i: (i, 0),
                                    memory_space=pltpu.VMEM)),
            interpret=jax.default_backend() != "tpu",
        )(xp, *mats)
    return f


def igr_value_kcat(field, params):
    """f32x3 value path with the 3-pass decomposition folded into ONE
    K-concatenated dot per layer: [a_hi a_hi a_lo] @ [w_hi; w_lo; w_hi]
    == a_hi@w_hi + a_hi@w_lo + a_lo@w_hi (sum over the K blocks)."""
    beta = 100.0
    inv_sqrt2 = 1.0 / math.sqrt(2.0)
    layers = params["layers"]
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
    # pack [w_hi; w_lo; w_hi] stacked along K
    mats = []
    for w, b in zip(ws, bs):
        wt = jnp.asarray(w).T
        hi, lo = pm._split_hi_lo(wt)
        mats.append(jnp.concatenate([hi, lo, hi], axis=0))   # (3K, N)
        mats.append(jnp.asarray(b)[None, :])
    n_layers = len(ws)
    skip_in, final_tanh = field.skip_in, field.final_tanh

    def kernel(x_ref, *refs):
        out_ref = refs[-1]
        wrefs = refs[:-1]
        x = x_ref[:]
        h = x

        def mmk(a, wref):
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            a3 = jnp.concatenate([a_hi, a_hi, a_lo], axis=-1)
            return jnp.dot(a3, wref[:],
                           preferred_element_type=jnp.float32)

        for l in range(n_layers):
            if l in skip_in:
                h = jnp.concatenate([h, x], axis=-1) * inv_sqrt2
            z = mmk(h, wrefs[2 * l]) + wrefs[2 * l + 1][:]
            h = jax.nn.softplus(beta * z) / beta if l < n_layers - 1 else z
        out_ref[:] = jnp.tanh(h) if final_tanh else h

    w_specs = [pl.BlockSpec(m.shape, lambda i: (0, 0),
                            memory_space=pltpu.VMEM) for m in mats]

    def f(x):
        n = x.shape[0]
        n_pad = pm._round_up(n, _TILE)
        xp = jnp.zeros((n_pad, 3), jnp.float32).at[:n].set(x)
        return pl.pallas_call(
            kernel,
            grid=(n_pad // _TILE,),
            in_specs=[pl.BlockSpec((_TILE, 3), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM)] + w_specs,
            out_shape=jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            out_specs=pl.BlockSpec((_TILE, 1), lambda i: (i, 0),
                                   memory_space=pltpu.VMEM),
            interpret=jax.default_backend() != "tpu",
        )(xp, *mats)
    return f


def main():
    field = SDFField(hidden_size=256, n_layers=4, num_frequencies=0)
    params = field.init(jax.random.key(0))
    x = jax.random.uniform(jax.random.key(1), (N, 3),
                           minval=-0.9, maxval=0.9)

    sdf, sdf_grad = pm.make_fused_igr_sdf(field, params, precision="f32x3")
    sdf_b, _ = pm.make_fused_igr_sdf(field, params, precision="bf16")

    t = timeit(scan_rep(lambda v: sdf(v)), x)
    print(f"value f32x3 (shipped):      {t*1e3:7.2f} ms /524k", flush=True)
    t = timeit(scan_rep(lambda v: sdf_b(v)), x)
    print(f"value bf16 (shipped):       {t*1e3:7.2f} ms /524k", flush=True)
    t = timeit(scan_rep(lambda v: sdf_grad(v)), x)
    print(f"value+grad f32x3 (shipped): {t*1e3:7.2f} ms /524k", flush=True)

    fb = run_batched(field, params)
    t = timeit(scan_rep(lambda v: fb(v)), x)
    print(f"value+grad f32x3 (batched-tangents): {t*1e3:7.2f} ms /524k",
          flush=True)

    fk = igr_value_kcat(field, params)
    t = timeit(scan_rep(lambda v: fk(v)), x)
    print(f"value f32x3 (kcat single-dot):       {t*1e3:7.2f} ms /524k",
          flush=True)
    vk = fk(x[:4096])[:4096, 0]
    v0 = sdf(x[:4096])
    print("kcat dv max:", float(jnp.max(jnp.abs(v0 - vk))))

    # numeric check vs shipped
    import numpy as np
    v0, g0 = sdf_grad(x[:4096])
    v1, g1 = fb(x[:4096])
    v1, g1 = v1[:4096, 0], g1[:4096]
    print("dv max:", float(jnp.max(jnp.abs(v0 - v1))),
          " dg max:", float(jnp.max(jnp.abs(g0 - g1))))


if __name__ == "__main__":
    main()
