"""Gradient-debug capture (parity: reference DSS/__init__.py:21-51).

The reference registers torch backward hooks on named point sets and
collects (world position, gradient) pairs into a global DebuggingTensor
for quiver-plot observability. The JAX equivalent: models, when
debugging mode is on, route per-point gradients through
`capture_grad(name, x)` — an identity whose VJP stores the cotangent
into the global `DebugState` via `jax.debug.callback` (host side).

This gives the same "pixel-grad" observability channel named in
BASELINE.json without perturbing any compiled computation (identity
forward; callback only fires when debugging is enabled).
"""

from typing import Dict, Optional

import jax
import numpy as np


class DebugState:
    """Host-side store of per-named-point-set positions and grads."""

    def __init__(self):
        self.pts_world: Dict[str, np.ndarray] = {}
        self.pts_world_grad: Dict[str, np.ndarray] = {}
        self.img_mask_grad: Optional[np.ndarray] = None

    def clear(self):
        self.pts_world.clear()
        self.pts_world_grad.clear()
        self.img_mask_grad = None


_DEBUG = False
_STATE = DebugState()


def set_debugging_mode_(on: bool) -> None:
    global _DEBUG
    _DEBUG = bool(on)
    if not _DEBUG:
        _STATE.clear()


def get_debugging_mode() -> bool:
    return _DEBUG


def get_debugging_tensor() -> DebugState:
    return _STATE


def _store(name: str, pts: np.ndarray, grad: np.ndarray) -> None:
    _STATE.pts_world[name] = np.asarray(pts)
    _STATE.pts_world_grad[name] = np.asarray(grad)


@jax.custom_vjp
def capture_grad(name_hash: jax.Array, x: jax.Array) -> jax.Array:
    del name_hash
    return x


def _capture_fwd(name_hash, x):
    return x, (name_hash, x)


_NAMES: Dict[int, str] = {}


def _capture_bwd(res, g):
    name_hash, x = res
    if _DEBUG:
        def cb(h, xv, gv):
            name = _NAMES.get(int(h), f"set{int(h)}")
            _store(name, xv, gv)
        jax.debug.callback(cb, name_hash, x, g)
    return (jax.numpy.zeros_like(name_hash), g)


capture_grad.defvjp(_capture_fwd, _capture_bwd)


def tap_grad(name: str, x: jax.Array) -> jax.Array:
    """Identity that records dL/dx for point set `name` when debugging."""
    if not _DEBUG:
        return x
    h = abs(hash(name)) % (2 ** 31)
    _NAMES[h] = name
    return capture_grad(jax.numpy.int32(h), x)


@jax.custom_vjp
def _capture_image_grad(x: jax.Array) -> jax.Array:
    return x


def _capture_image_fwd(x):
    return x, None


def _capture_image_bwd(res, g):
    del res
    if _DEBUG:
        def cb(gv):
            _STATE.img_mask_grad = np.asarray(gv)
        jax.debug.callback(cb, g)
    return (g,)


_capture_image_grad.defvjp(_capture_image_fwd, _capture_image_bwd)


def tap_image_grad(x: jax.Array) -> jax.Array:
    """Identity that records the per-pixel mask-image gradient
    (reference DebuggingTensor.img_mask_grad, DSS/__init__.py:21-31;
    hooks at point_modeling.py:197-221) into
    `get_debugging_tensor().img_mask_grad` when debugging is on."""
    if not _DEBUG:
        return x
    return _capture_image_grad(x)
