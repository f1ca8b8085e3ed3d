"""Deterministic PRNG key threading.

The reference seeds four global RNGs (src/utils/setup.py:65-84); JAX threads
explicit keys instead. `KeyChain` hands out fresh subkeys from a root seed so
init/dropout/sampling are reproducible without global state.
"""

from __future__ import annotations

import jax


class KeyChain:
    """Stateful convenience wrapper over jax.random.split."""

    def __init__(self, seed: int | jax.Array):
        self._key = jax.random.key(seed) if isinstance(seed, int) else seed

    def next(self) -> jax.Array:
        self._key, sub = jax.random.split(self._key)
        return sub

    def split(self, n: int) -> jax.Array:
        self._key, *subs = jax.random.split(self._key, n + 1)
        return jax.numpy.stack(subs)
