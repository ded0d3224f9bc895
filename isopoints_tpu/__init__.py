"""isopoints_tpu — a TPU-native (JAX/XLA/Pallas) iso-points framework.

A from-scratch re-design of the capabilities of yifita/iso-points
("Iso-Points: Optimizing Neural Implicit Surfaces with Hybrid
Representations", CVPR 2021): neural implicit surfaces (SIREN / IGR SDF
MLPs) coupled with explicit iso-point clouds extracted by Newton
projection onto the zero level set, uniform/edge-aware resampling, a
differentiable EWA surface-splatting rasterizer, IDR-style ray tracing,
and multiview/point-cloud reconstruction trainers.

Design stance (see SURVEY.md §7): padded arrays + validity masks
everywhere, `lax.while_loop`/`lax.scan` for all iterative geometry,
`jax.custom_vjp` for implicit differentiation and rasterizer gradients,
Pallas kernels for the splatting hot loops, and `shard_map` over a
`jax.sharding.Mesh` for multi-chip scaling (rays/points sharded on a
data axis, SDF-MLP grads `psum` over ICI).

Reference parity map: `/root/reference/DSS/__init__.py` (debug state),
`/root/reference/DSS/logger.py` (logging).
"""

__version__ = "0.1.0"

import os as _os

if _os.environ.get("ISOPOINTS_PLATFORM"):
    # The axon sitecustomize registers the TPU backend and overrides
    # JAX_PLATFORMS before any user code runs, so the standard env var
    # CANNOT force entry-point subprocesses onto CPU (tests/test_entries
    # would silently compile on — and contend for — the real chip).
    # This variable is honored at package import, which in every entry
    # script precedes first device use.
    import jax as _jax

    try:
        _jax.config.update("jax_platforms",
                           _os.environ["ISOPOINTS_PLATFORM"])
    except RuntimeError as _e:
        # backend already initialized by the host process — the force
        # did NOT take effect; this is exactly the failure mode this
        # hook exists to prevent, so it must not be silent (r4 advisor)
        import sys as _sys
        print(f"isopoints_tpu: ISOPOINTS_PLATFORM="
              f"{_os.environ['ISOPOINTS_PLATFORM']!r} could not be "
              f"applied ({_e}); backend stays "
              f"{_jax.default_backend()!r}", file=_sys.stderr)

from isopoints_tpu.logger import get_logger
from isopoints_tpu.debug import (
    DebugState,
    get_debugging_mode,
    get_debugging_tensor,
    set_debugging_mode_,
)
from isopoints_tpu.rng import set_deterministic_seed

__all__ = [
    "get_logger",
    "DebugState",
    "set_debugging_mode_",
    "get_debugging_mode",
    "get_debugging_tensor",
    "set_deterministic_seed",
    "__version__",
]
