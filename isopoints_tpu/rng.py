"""RNG discipline (parity: reference DSS/__init__.py:11-19 set_deterministic_).

JAX PRNG is already deterministic and splittable; this module provides
a seed helper for the numpy/python sides plus a small key-chain utility
so long training loops never reuse a key.
"""

import random

import jax
import numpy as np


def set_deterministic_seed(seed: int = 0) -> jax.Array:
    """Seed numpy/python RNGs; return a root JAX key."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.key(seed)


class KeyChain:
    """Stateful key dispenser for host-side loop code.

    Inside jitted functions, thread keys explicitly; this is for the
    outer training loop where a mutable dispenser is ergonomic.
    """

    def __init__(self, seed_or_key):
        if isinstance(seed_or_key, int):
            self._key = jax.random.key(seed_or_key)
        else:
            self._key = seed_or_key

    def next(self, n: int = 1):
        keys = jax.random.split(self._key, n + 1)
        self._key = keys[0]
        if n == 1:
            return keys[1]
        return keys[1:]
