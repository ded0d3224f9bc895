"""Point subset sampling: farthest point sampling, random subsets.

Parity: reference torch_cluster `fps` usage
(DSS/utils/point_processing.py:473-499) — here an exact FPS as a
`lax.scan` over selections (each step O(P) masked min-dist update,
vectorized over the batch; no kernel needed).
"""

from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("n_samples",))
def farthest_point_sampling(
    points: jax.Array,
    n_samples: int,
    mask: Optional[jax.Array] = None,
    start_idx: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Exact farthest point sampling.

    Args:
      points: (B, P, 3); mask: (B, P) validity.
      n_samples: number of samples (static).
      start_idx: index of the first selected point (deterministic, like
        torch_cluster fps default random_start=False semantics).

    Returns:
      idx: (B, n_samples) selected indices (may repeat if a cloud has
        fewer valid points than n_samples — mask them via out_mask).
      out_mask: (B, n_samples) False where a cloud ran out of points.
    """
    b, p, _ = points.shape
    if mask is None:
        mask = jnp.ones((b, p), dtype=bool)

    # First point: first valid index (start_idx offset within valid set).
    first = jnp.argmax(mask, axis=-1)  # (B,)
    first = jnp.where(mask.any(axis=-1), first, 0)

    def dist_to(i):
        sel = jnp.take_along_axis(points, i[:, None, None], axis=1)  # (B,1,3)
        d = jnp.sum((points - sel) ** 2, axis=-1)
        return jnp.where(mask, d, -1.0)  # invalid points never become farthest

    def step(carry, _):
        min_d, last = carry
        min_d = jnp.minimum(min_d, dist_to(last))
        nxt = jnp.argmax(min_d, axis=-1)
        return (min_d, nxt), nxt

    init_d = jnp.where(mask, jnp.inf, -1.0)
    (_, _), rest = jax.lax.scan(step, (init_d, first), None, length=n_samples - 1)
    idx = jnp.concatenate([first[:, None], rest.T], axis=1)  # (B, S)
    n_valid = jnp.sum(mask, axis=-1)
    out_mask = jnp.arange(n_samples)[None, :] < jnp.minimum(n_valid, n_samples)[:, None]
    return idx, out_mask


def fps_subsample(points: jax.Array, ratio: float, mask: Optional[jax.Array] = None):
    """FPS by ratio of capacity (torch_cluster fps(ratio) parity).

    Returns (sampled_points (B,S,3), out_mask (B,S), idx (B,S)) with
    S = ceil(P*ratio); per-cloud valid counts scale by ratio.
    """
    b, p, _ = points.shape
    s = max(1, int(-(-p * ratio // 1)))
    if mask is None:
        mask = jnp.ones((b, p), dtype=bool)
    idx, out_mask = farthest_point_sampling(points, s, mask)
    n_valid = jnp.sum(mask, axis=-1)
    want = jnp.ceil(n_valid * ratio).astype(jnp.int32)
    out_mask = out_mask & (jnp.arange(s)[None, :] < want[:, None])
    sampled = jnp.take_along_axis(points, idx[..., None], axis=1)
    return sampled, out_mask, idx
