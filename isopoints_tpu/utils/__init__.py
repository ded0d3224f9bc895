"""Array/masking utilities for the padded+mask geometry core.

Parity: reference DSS/utils/__init__.py. The reference juggles three
point-set layouts (list, packed, padded); on TPU we standardize on ONE:
padded `(B, P, C)` float arrays with a `(B, P)` bool validity mask.
XLA needs static shapes anyway, and the reference's own hot loops
already operate on padded+mask (levelset_sampling.py:290-351).
"""

import importlib
from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np

EPS = 1e-10


def eps_denom(x: jax.Array, eps: float = 1e-17) -> jax.Array:
    """Push a denominator away from zero, preserving sign.

    Parity: reference DSS/utils/mathHelper.py:14-18 and
    DSS/csrc/rasterization_utils.cuh:37-43.
    """
    sign = jnp.where(x < 0.0, -1.0, 1.0)
    return sign * jnp.maximum(jnp.abs(x), eps)


def eps_sqrt(x: jax.Array, eps: float = 1e-17) -> jax.Array:
    """Prepare a squared quantity for sqrt: |x| clamped to ≥ eps
    (mathHelper.py:20-25 — the reference clamps only; the CALLER takes
    the sqrt, so `jnp.sqrt(eps_sqrt(x))` is the idiom)."""
    return jnp.maximum(jnp.abs(x), eps)


def valid_value_mask(x: jax.Array) -> jax.Array:
    """Finite-value mask (utils/__init__.py:15)."""
    return jnp.isfinite(x)


def check_weights(params: Any) -> bool:
    """NaN/Inf guard over a pytree (utils/__init__.py:50-64).

    Host-side: call on materialized params between steps. Returns True
    if all leaves are finite; logs offenders.
    """
    from isopoints_tpu.logger import get_logger

    ok = True
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        arr = np.asarray(leaf)
        if arr.dtype.kind == "f" and not np.isfinite(arr).all():
            get_logger().warning("non-finite values in %s", jax.tree_util.keystr(path))
            ok = False
    return ok


def get_class_from_string(cls_str: str):
    """Import `pkg.mod.Class` from a dotted string (utils/__init__.py:67-72)."""
    mod_name, _, cls_name = cls_str.rpartition(".")
    mod = importlib.import_module(mod_name)
    return getattr(mod, cls_name)


def slice_dict(d: Dict[str, Any], idx) -> Dict[str, Any]:
    """Index every array value of a dict (utils/__init__.py:75-83)."""
    return {k: (v[idx] if v is not None else None) for k, v in d.items()}


def scaler_to_color(scalar: np.ndarray, cmap: str = "jet") -> np.ndarray:
    """Map a scalar array to RGB in [0,1] (utils/__init__.py:86-116)."""
    import matplotlib.cm as cm
    import matplotlib.colors as mcolors

    scalar = np.asarray(scalar, dtype=np.float64)
    lo, hi = np.nanmin(scalar), np.nanmax(scalar)
    norm = mcolors.Normalize(vmin=lo, vmax=hi if hi > lo else lo + 1.0)
    return np.asarray(cm.get_cmap(cmap)(norm(scalar)))[..., :3]


# ---------------------------------------------------------------------------
# Padded/mask helpers (replace the reference's packed<->padded machinery)
# ---------------------------------------------------------------------------

def lengths_to_mask(lengths: jax.Array, max_len: int) -> jax.Array:
    """(B,) int -> (B, max_len) bool."""
    ar = jnp.arange(max_len)[None, :]
    return ar < lengths[:, None]


def mask_to_lengths(mask: jax.Array) -> jax.Array:
    return jnp.sum(mask.astype(jnp.int32), axis=-1)


def masked_mean(x: jax.Array, mask: jax.Array, axis=None, keepdims=False) -> jax.Array:
    """Mean of x over `mask`-selected entries; mask broadcast against x."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    num = jnp.sum(x * m, axis=axis, keepdims=keepdims)
    den = jnp.sum(m, axis=axis, keepdims=keepdims)
    return num / jnp.maximum(den, 1.0)


def masked_sum(x: jax.Array, mask: jax.Array, axis=None, keepdims=False) -> jax.Array:
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    return jnp.sum(x * m, axis=axis, keepdims=keepdims)


def compact_padded(points: jax.Array, mask: jax.Array):
    """Move valid rows to the front of each batch row, preserving order.

    Replaces the reference's boolean-index compaction
    (levelset_sampling.py:59-77 `_filter_projection_result`) with a
    static-shape argsort on ~mask (stable), TPU-friendly.

    Args:
      points: (B, P, C); mask: (B, P) bool.
    Returns:
      (points_compacted, mask_compacted) of the same shapes, where all
      valid entries precede invalid ones.
    """
    order = jnp.argsort(jnp.logical_not(mask), axis=-1, stable=True)  # valid first
    pts = jnp.take_along_axis(points, order[..., None], axis=1)
    msk = jnp.take_along_axis(mask, order, axis=1)
    return pts, msk


def gather_padded(x: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: x (B,P,C), idx (B,K) -> (B,K,C). Negative idx -> row 0."""
    safe = jnp.maximum(idx, 0)
    return jnp.take_along_axis(x, safe[..., None], axis=1)


def resize_padded(points: jax.Array, mask: jax.Array, new_p: int):
    """Grow/shrink capacity P -> new_p (valid entries assumed front-compacted)."""
    b, p, c = points.shape
    if new_p == p:
        return points, mask
    if new_p > p:
        pad_pts = jnp.zeros((b, new_p - p, c), points.dtype)
        pad_msk = jnp.zeros((b, new_p - p), dtype=bool)
        return (jnp.concatenate([points, pad_pts], axis=1),
                jnp.concatenate([mask, pad_msk], axis=1))
    return points[:, :new_p], mask[:, :new_p]


def num_valid(mask: jax.Array) -> jax.Array:
    return jnp.sum(mask.astype(jnp.int32), axis=-1)


def make_image_grid(images: Sequence[np.ndarray], ncols: int = 4, pad: int = 2) -> np.ndarray:
    """Tile HxWx3 images into a grid (utils/__init__.py:251-263)."""
    images = [np.asarray(im) for im in images]
    h = max(im.shape[0] for im in images)
    w = max(im.shape[1] for im in images)
    n = len(images)
    ncols = min(ncols, n)
    nrows = (n + ncols - 1) // ncols
    grid = np.ones((nrows * (h + pad) - pad, ncols * (w + pad) - pad, 3), dtype=images[0].dtype)
    for i, im in enumerate(images):
        r, c = divmod(i, ncols)
        if im.ndim == 2:
            im = np.stack([im] * 3, -1)
        grid[r * (h + pad): r * (h + pad) + im.shape[0],
             c * (w + pad): c * (w + pad) + im.shape[1]] = im[..., :3]
    return grid
