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
                           features: jax.Array,
                           gathered_features: Optional[jax.Array] = None
                           ) -> jax.Array:
    """Unnormalized weighted sum over the K fragments per pixel.

    Args:
      idx: (B, S, S, K) int point indices, -1 = empty.
      weights: (B, S, S, K) fragment weights.
      features: (B, P, C) per-point features.
      gathered_features: optional pre-gathered (B, S, S, K, C) — pass
        it when the caller already gathered per-fragment data (each
        (B,S,S,K) gather costs ~9 ms at 512px; the renderer fuses the
        feature gather with its scaler gather).
    Returns: (B, S, S, C).
    """
    valid = idx >= 0
    if gathered_features is None:
        safe = jnp.where(valid, idx, 0)
        gathered_features = jax.vmap(lambda f, i: f[i])(
            features, safe)                                    # (B,S,S,K,C)
    w = jnp.where(valid, weights, 0.0)[..., None]
    return jnp.sum(gathered_features * w, axis=-2)


def norm_weighted_sum_composite(idx: jax.Array, weights: jax.Array,
                                features: jax.Array,
                                eps: float = 1e-10,
                                gathered_features: Optional[jax.Array] = None
                                ) -> jax.Array:
    """Normalized weighted sum (pytorch3d NormWeightedCompositor parity):
    out = Σ w_k·f_k / max(Σ w_k, eps)."""
    valid = idx >= 0
    if gathered_features is None:
        safe = jnp.where(valid, idx, 0)
        gathered_features = jax.vmap(lambda f, i: f[i])(features, safe)
    w = jnp.where(valid, weights, 0.0)
    total = jnp.sum(w, axis=-1, keepdims=True)
    wn = w / jnp.maximum(total, eps)
    return jnp.sum(gathered_features * wn[..., None], axis=-2)
