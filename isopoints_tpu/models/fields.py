"""Implicit field networks: SIREN, IGR/DeepSDF-style SDF, IDR color net.

Parity: reference DSS/models/common.py — `Siren` (:90), `SDF` (:220),
`RenderingNetwork` (:313), `Occupancy` (:413), NeRF `Embedder` (:171),
`approximate_gradient` (:492). Re-designed functionally for JAX: each
field is a lightweight config object with pure `init(key) -> params`
and `apply(params, x, c=None) -> FieldOutput`; params are plain
pytrees so they jit/pjit/`grad` cleanly and gradients w.r.t. *inputs*
(needed everywhere: eikonal, Newton projection, normals) are a one-line
`jax.grad`.

All matmuls run in float32 by default with an optional bfloat16
compute dtype for the MXU (geometry-critical paths keep f32).
"""

import math
from typing import Callable, Dict, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


class FieldOutput(NamedTuple):
    """Parity: common.py:21-23 `_net_output` namedtuple."""
    sdf: Optional[jax.Array] = None
    latent: Optional[jax.Array] = None
    rgb: Optional[jax.Array] = None
    occupancy: Optional[jax.Array] = None


_FIELDS = ("sdf", "latent", "rgb", "occupancy")


def _validate_out_dims(out_dims: Dict[str, int]) -> None:
    for k, v in out_dims.items():
        if k not in _FIELDS:
            raise ValueError(f"invalid out_dims key {k}")
        if k in ("sdf", "occupancy") and v != 1:
            raise ValueError(f"{k} must have dim 1")
        if k == "rgb" and v != 3:
            raise ValueError("rgb must have dim 3")


def _split_output(x: jax.Array, out_dims: Dict[str, int],
                  scale_rgb: bool = False, sigmoid_rgb: bool = False) -> FieldOutput:
    parts = {}
    ofs = 0
    for k, d in out_dims.items():
        parts[k] = x[..., ofs:ofs + d]
        ofs += d
    if "rgb" in parts:
        if scale_rgb:
            parts["rgb"] = (parts["rgb"] + 1.0) / 2.0
        elif sigmoid_rgb:
            parts["rgb"] = jax.nn.sigmoid(parts["rgb"])
    return FieldOutput(**parts)


# ---------------------------------------------------------------------------
# Positional embedding (NeRF): common.py:171-217
# ---------------------------------------------------------------------------

def positional_embedder(multires: int, input_dims: int = 3,
                        include_input: bool = True, log_sampling: bool = True
                        ) -> Tuple[Callable[[jax.Array], jax.Array], int]:
    """Returns (embed_fn, out_dim); sin/cos at `multires` octaves."""
    if multires <= 0:
        return (lambda x: x), input_dims
    if log_sampling:
        freqs = 2.0 ** np.linspace(0.0, multires - 1, multires)
    else:
        freqs = np.linspace(1.0, 2.0 ** (multires - 1), multires)
    freqs = jnp.asarray(freqs, jnp.float32)
    out_dim = (input_dims if include_input else 0) + input_dims * 2 * multires

    def embed(x: jax.Array) -> jax.Array:
        xf = x[..., None, :] * freqs[:, None]          # (..., F, D)
        sin = jnp.sin(xf)
        cos = jnp.cos(xf)
        # Interleave per frequency [sin(f0 x), cos(f0 x), sin(f1 x), ...]
        enc = jnp.stack([sin, cos], axis=-2)           # (..., F, 2, D)
        enc = enc.reshape(*x.shape[:-1], -1)
        if include_input:
            enc = jnp.concatenate([x, enc], axis=-1)
        return enc

    return embed, out_dim


# ---------------------------------------------------------------------------
# Linear layers (plain / weight-normalized)
# ---------------------------------------------------------------------------

def _linear(params: Dict[str, jax.Array], x: jax.Array,
            compute_dtype=None) -> jax.Array:
    if "v" in params:  # weight norm: w = g * v / ||v||_row
        v, g = params["v"], params["g"]
        w = v * (g / jnp.maximum(jnp.linalg.norm(v, axis=1, keepdims=True), 1e-12))
    else:
        w = params["w"]
    b = params["b"]
    if compute_dtype is not None:
        y = jnp.dot(x.astype(compute_dtype), w.T.astype(compute_dtype),
                    preferred_element_type=jnp.float32)
        return y.astype(jnp.float32) + b
    # f32 path: force full-precision MXU passes (TPU default would be bf16)
    return jnp.dot(x, w.T, precision=jax.lax.Precision.HIGHEST) + b


def _make_linear(w: jax.Array, b: jax.Array, weight_norm: bool) -> Dict[str, jax.Array]:
    if weight_norm:
        g = jnp.linalg.norm(w, axis=1, keepdims=True)
        return {"v": w, "g": g, "b": b}
    return {"w": w, "b": b}


# ---------------------------------------------------------------------------
# SIREN (common.py:56-167)
# ---------------------------------------------------------------------------

class SirenField:
    """SIREN MLP: sine activations, ω₀-scaled init (SineLayer common.py:56-88).

    Layers: first SineLayer(dim+c_dim -> h), `n_layers` hidden SineLayers,
    final linear head (init U(±√(6/h)/ω₀)); optional final activation.
    """

    def __init__(self, dim: int = 3, hidden_size: int = 256, n_layers: int = 3,
                 out_dims: Optional[Dict[str, int]] = None, c_dim: int = 0,
                 first_omega_0: float = 30.0, hidden_omega_0: float = 30.0,
                 outermost_linear: bool = True, activation: Optional[str] = None):
        self.out_dims = dict(out_dims or {"sdf": 1})
        _validate_out_dims(self.out_dims)
        self.out_dim = sum(self.out_dims.values())
        self.dim = dim
        self.c_dim = c_dim
        self.in_dim = dim + c_dim
        self.hidden_size = hidden_size
        self.n_layers = n_layers
        self.first_omega_0 = first_omega_0
        self.hidden_omega_0 = hidden_omega_0
        self.outermost_linear = outermost_linear
        self.activation = activation  # None | 'tanh' | 'sigmoid'

    def init(self, key: jax.Array) -> Dict:
        keys = jax.random.split(key, self.n_layers + 2)
        layers = []
        # first sine layer: U(-1/in, 1/in)
        w = jax.random.uniform(keys[0], (self.hidden_size, self.in_dim),
                               minval=-1.0 / self.in_dim, maxval=1.0 / self.in_dim)
        layers.append({"w": w, "b": jnp.zeros(self.hidden_size)})
        bound = math.sqrt(6.0 / self.hidden_size) / self.hidden_omega_0
        for i in range(self.n_layers):
            w = jax.random.uniform(keys[1 + i], (self.hidden_size, self.hidden_size),
                                   minval=-bound, maxval=bound)
            layers.append({"w": w, "b": jnp.zeros(self.hidden_size)})
        w = jax.random.uniform(keys[-1], (self.out_dim, self.hidden_size),
                               minval=-bound, maxval=bound)
        layers.append({"w": w, "b": jnp.zeros(self.out_dim)})
        return {"layers": layers}

    def apply(self, params: Dict, x: jax.Array, c: Optional[jax.Array] = None
              ) -> FieldOutput:
        if self.c_dim > 0 and c is not None:
            x = jnp.concatenate([c, x], axis=-1)
        layers = params["layers"]
        h = jnp.sin(self.first_omega_0 * _linear(layers[0], x))
        for lp in layers[1:-1]:
            h = jnp.sin(self.hidden_omega_0 * _linear(lp, h))
        out = _linear(layers[-1], h)
        if not self.outermost_linear:
            out = jnp.sin(self.hidden_omega_0 * out)
        if self.activation == "tanh":
            out = jnp.tanh(out)
            return _split_output(out, self.out_dims, scale_rgb=True)
        if self.activation == "sigmoid":
            out = jax.nn.sigmoid(out)
            return _split_output(out, self.out_dims)
        return _split_output(out, self.out_dims, sigmoid_rgb=True)

    def sdf(self, params: Dict, x: jax.Array, c: Optional[jax.Array] = None) -> jax.Array:
        return self.apply(params, x, c).sdf[..., 0]


# ---------------------------------------------------------------------------
# IGR / DeepSDF-style SDF net (common.py:220-311)
# ---------------------------------------------------------------------------

class SDFField:
    """8×512 softplus(β=100) SDF MLP, geometric init, skip at layer 4.

    Geometric init (SAL): last layer ~ N(√π/√fan_in, 1e-4), bias -r so
    the initial field is approximately an r-sphere; positional-encoding
    columns zeroed at the input and skip layers (common.py:258-275).
    Output squashed by tanh (common.py:305).
    """

    def __init__(self, dim: int = 3, out_dims: Optional[Dict[str, int]] = None,
                 hidden_size: int = 512, n_layers: int = 8, bias: float = 0.6,
                 weight_norm: bool = True, skip_in: Sequence[int] = (4,),
                 num_frequencies: int = 6, final_tanh: bool = True):
        self.out_dims = dict(out_dims or {"sdf": 1})
        _validate_out_dims(self.out_dims)
        self.out_dim = sum(self.out_dims.values())
        self.raw_dim = dim
        self.embed, in_dim = positional_embedder(num_frequencies, dim)
        self.num_frequencies = num_frequencies
        self.dims = [in_dim] + [hidden_size] * n_layers + [self.out_dim]
        self.skip_in = tuple(skip_in)
        self.bias = bias
        self.weight_norm = weight_norm
        self.final_tanh = final_tanh

    def init(self, key: jax.Array) -> Dict:
        nl = len(self.dims) - 1
        keys = jax.random.split(key, nl)
        layers = []
        d0 = self.dims[0]
        for l in range(nl):
            in_d = self.dims[l]
            out_d = self.dims[l + 1]
            if l + 1 in self.skip_in:
                out_d = out_d - d0
            if l == nl - 1:  # geometric init
                w = (math.sqrt(math.pi) / math.sqrt(in_d)
                     + 0.0001 * jax.random.normal(keys[l], (out_d, in_d)))
                b = jnp.full((out_d,), -self.bias)
            else:
                w = jax.random.normal(keys[l], (out_d, in_d)) * (math.sqrt(2.0) / math.sqrt(out_d))
                b = jnp.zeros(out_d)
                if self.num_frequencies > 0 and l == 0:
                    # zero the pos-enc columns, keep raw xyz
                    w = w.at[:, self.raw_dim:].set(0.0)
                elif self.num_frequencies > 0 and l in self.skip_in:
                    # zero the skip-in pos-enc tail columns
                    w = w.at[:, -(d0 - self.raw_dim):].set(0.0)
            layers.append(_make_linear(w, b, self.weight_norm))
        return {"layers": layers}

    def apply(self, params: Dict, x: jax.Array, c: Optional[jax.Array] = None
              ) -> FieldOutput:
        inp = self.embed(x)
        h = inp
        if c is not None:
            h = jnp.concatenate([c, h], axis=-1)
        layers = params["layers"]
        nl = len(layers)
        inv_sqrt2 = 1.0 / math.sqrt(2.0)
        softplus = lambda v: jax.nn.softplus(100.0 * v) / 100.0
        for l, lp in enumerate(layers):
            if l in self.skip_in:
                h = jnp.concatenate([h, inp], axis=-1) * inv_sqrt2
            h = _linear(lp, h)
            if l < nl - 1:
                h = softplus(h)
        if self.final_tanh:
            h = jnp.tanh(h)
        return _split_output(h, self.out_dims, sigmoid_rgb=True)

    def sdf(self, params: Dict, x: jax.Array, c: Optional[jax.Array] = None) -> jax.Array:
        return self.apply(params, x, c).sdf[..., 0]


# ---------------------------------------------------------------------------
# IDR rendering network (common.py:313-366)
# ---------------------------------------------------------------------------

class RenderingNetwork:
    """Color net on [x?, normal, embedded view dir, latent] -> rgb (tanh->[0,1]).

    Like the reference (common.py:313-366 + texture.py:130-162), the
    CALLER embeds the view direction (`embed_view`) before concatenating
    — `dim` counts raw dims (e.g. 9 = normal+point+view) and the input
    width is dim + c_dim + (embed_dim - 3). Use `apply_with_view` for
    the standard [normal, point, embedded-view] layout.
    """

    def __init__(self, dim: int = 9, out_dims: Optional[Dict[str, int]] = None,
                 c_dim: int = 256, hidden_size: int = 512, n_layers: int = 4,
                 weight_norm: bool = True, num_frequencies: int = 4):
        self.out_dims = dict(out_dims or {"rgb": 3})
        _validate_out_dims(self.out_dims)
        self.out_dim = sum(self.out_dims.values())
        self.c_dim = c_dim
        self.embed_view, view_dim = positional_embedder(num_frequencies, 3)
        self.num_frequencies = num_frequencies
        in_dim = dim + c_dim + (view_dim - 3 if num_frequencies > 0 else 0)
        self.dims = [in_dim] + [hidden_size] * n_layers + [self.out_dim]
        self.weight_norm = weight_norm

    def init(self, key: jax.Array) -> Dict:
        nl = len(self.dims) - 1
        keys = jax.random.split(key, nl)
        layers = []
        for l in range(nl):
            in_d, out_d = self.dims[l], self.dims[l + 1]
            bound = 1.0 / math.sqrt(in_d)
            w = jax.random.uniform(keys[l], (out_d, in_d), minval=-bound, maxval=bound)
            b = jax.random.uniform(jax.random.fold_in(keys[l], 1), (out_d,),
                                   minval=-bound, maxval=bound)
            layers.append(_make_linear(w, b, self.weight_norm))
        return {"layers": layers}

    def apply(self, params: Dict, x: jax.Array, c: Optional[jax.Array] = None
              ) -> FieldOutput:
        if c is not None:
            x = jnp.concatenate([c, x], axis=-1)
        layers = params["layers"]
        h = x
        for l, lp in enumerate(layers):
            h = _linear(lp, h)
            if l < len(layers) - 1:
                h = jax.nn.relu(h)
        h = jnp.tanh(h)
        return _split_output(h, self.out_dims, scale_rgb=True)

    def apply_with_view(self, params: Dict, normals: jax.Array, points: jax.Array,
                        view_dirs: jax.Array, c: Optional[jax.Array] = None
                        ) -> FieldOutput:
        """[normals, points, embed(view)] layout (texture.py:140-156)."""
        x = jnp.concatenate([normals, points, self.embed_view(view_dirs)], axis=-1)
        return self.apply(params, x, c)


# ---------------------------------------------------------------------------
# Occupancy network (ONet ResNet blocks; common.py:368-490)
# ---------------------------------------------------------------------------

class OccupancyField:
    """ONet-style occupancy decoder: ResNet FC blocks + conditional code add."""

    def __init__(self, dim: int = 3, c_dim: int = 0, hidden_size: int = 512,
                 n_blocks: int = 5, out_dims: Optional[Dict[str, int]] = None):
        self.out_dims = dict(out_dims or {"occupancy": 1})
        _validate_out_dims(self.out_dims)
        self.out_dim = sum(self.out_dims.values())
        self.dim = dim
        self.c_dim = c_dim
        self.hidden_size = hidden_size
        self.n_blocks = n_blocks

    def init(self, key: jax.Array) -> Dict:
        h = self.hidden_size
        ks = jax.random.split(key, 3 + 3 * self.n_blocks)

        def lin(k, o, i, zero=False):
            if zero:
                return {"w": jnp.zeros((o, i)), "b": jnp.zeros(o)}
            bound = 1.0 / math.sqrt(i)
            return {"w": jax.random.uniform(k, (o, i), minval=-bound, maxval=bound),
                    "b": jnp.zeros(o)}

        params = {"fc_in": lin(ks[0], h, self.dim), "blocks": [],
                  "fc_out": lin(ks[1], self.out_dim, h)}
        if self.c_dim > 0:
            params["fc_c"] = [lin(jax.random.fold_in(ks[2], i), h, self.c_dim)
                              for i in range(self.n_blocks)]
        for i in range(self.n_blocks):
            params["blocks"].append({
                "fc0": lin(ks[3 + 3 * i], h, h),
                # ONet zero-inits the second block layer
                "fc1": lin(ks[4 + 3 * i], h, h, zero=True),
            })
        return params

    def apply(self, params: Dict, x: jax.Array, c: Optional[jax.Array] = None
              ) -> FieldOutput:
        h = _linear(params["fc_in"], x)
        for i, blk in enumerate(params["blocks"]):
            if self.c_dim > 0 and c is not None:
                h = h + _linear(params["fc_c"][i], c)
            dx = _linear(blk["fc1"], jax.nn.relu(_linear(blk["fc0"], jax.nn.relu(h))))
            h = h + dx
        out = _linear(params["fc_out"], jax.nn.relu(h))
        return _split_output(out, self.out_dims, sigmoid_rgb=True)


# ---------------------------------------------------------------------------
# Gradients w.r.t. inputs
# ---------------------------------------------------------------------------

def field_grad(apply_sdf: Callable[[jax.Array], jax.Array]) -> Callable[[jax.Array], jax.Array]:
    """Given x -> sdf (scalar per point), return x -> ∇sdf.

    Uses grad-of-sum: valid because each point's sdf depends only on
    that point; one backward pass for the whole batch (MXU-friendly).
    """
    return jax.grad(lambda x: jnp.sum(apply_sdf(x)))


def sdf_and_grad(apply_sdf: Callable[[jax.Array], jax.Array], x: jax.Array
                 ) -> Tuple[jax.Array, jax.Array]:
    """(sdf, ∇sdf) in one vjp (parity: levelset_sampling.py:142-170).

    If `apply_sdf` carries a fused `.sdf_and_grad` implementation
    (ops/pallas_mlp.py attaches one — forward-mode tangents inside the
    fused kernel), dispatch to it instead of autodiff.
    """
    fused = getattr(apply_sdf, "sdf_and_grad", None)
    if fused is not None:
        return fused(x)
    sdf, vjp = jax.vjp(lambda p: apply_sdf(p), x)
    (grad,) = vjp(jnp.ones_like(sdf))
    return sdf, grad


def approximate_gradient(apply_sdf: Callable[[jax.Array], jax.Array], x: jax.Array,
                         h: float = 1e-3) -> jax.Array:
    """6-point central differences (common.py:492-533) — for testing."""
    offsets = jnp.asarray([[1, 0, 0], [-1, 0, 0], [0, 1, 0],
                           [0, -1, 0], [0, 0, 1], [0, 0, -1]], x.dtype) * h
    vals = jax.vmap(lambda o: apply_sdf(x + o))(offsets)  # (6, ...)
    return jnp.stack([(vals[0] - vals[1]) / (2 * h),
                      (vals[2] - vals[3]) / (2 * h),
                      (vals[4] - vals[5]) / (2 * h)], axis=-1)
