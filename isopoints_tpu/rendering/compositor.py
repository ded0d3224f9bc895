"""Fragment compositors.

Parity: the reference composites with pytorch3d's
`NormWeightedCompositor` / `weighted_sum` (DSS/core/renderer.py:2-3,
59-72). Both are pure gathers + normalized sums — plain XLA fuses them
into the surrounding elementwise work, no kernel needed.
"""

from typing import Optional

import jax
import jax.numpy as jnp


def weighted_sum_composite(idx: jax.Array, weights: jax.Array,
                           features: jax.Array) -> jax.Array:
    """Unnormalized weighted sum over the K fragments per pixel.

    Args:
      idx: (B, S, S, K) int point indices, -1 = empty.
      weights: (B, S, S, K) fragment weights.
      features: (B, P, C) per-point features.
    Returns: (B, S, S, C).
    """
    b, p, c = features.shape
    valid = idx >= 0
    safe = jnp.where(valid, idx, 0)
    gathered = jax.vmap(lambda f, i: f[i])(features, safe)     # (B,S,S,K,C)
    w = jnp.where(valid, weights, 0.0)[..., None]
    return jnp.sum(gathered * w, axis=-2)


def norm_weighted_sum_composite(idx: jax.Array, weights: jax.Array,
                                features: jax.Array,
                                eps: float = 1e-10) -> jax.Array:
    """Normalized weighted sum (pytorch3d NormWeightedCompositor parity):
    out = Σ w_k·f_k / max(Σ w_k, eps)."""
    b, p, c = features.shape
    valid = idx >= 0
    safe = jnp.where(valid, idx, 0)
    gathered = jax.vmap(lambda f, i: f[i])(features, safe)
    w = jnp.where(valid, weights, 0.0)
    total = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / jnp.maximum(total, eps)
    return jnp.sum(gathered * wn[..., None], axis=-2)
