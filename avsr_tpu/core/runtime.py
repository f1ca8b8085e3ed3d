"""Process-level JAX runtime setup from RuntimeConfig.

The reference configures its runtime via env mutations scattered across
src/utils/setup.py:87-151 (TF32 hints, SDPA flags, AMP); here every knob is
a typed config field applied in one place, before any model code traces.
"""

from __future__ import annotations

import logging
import os

import jax

from avsr_tpu.core.config import RuntimeConfig

log = logging.getLogger("avsr.runtime")

_done = False


def setup_runtime(cfg: RuntimeConfig) -> None:
    """Apply process-level JAX config. Idempotent; call before tracing."""
    global _done
    if _done:
        return
    _done = True
    if cfg.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if cfg.prng_impl and cfg.prng_impl != "threefry":
        jax.config.update("jax_default_prng_impl", cfg.prng_impl)
    if cfg.compilation_cache_dir:
        path = os.path.expanduser(cfg.compilation_cache_dir)
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    log.debug("runtime: prng=%s cache=%s", cfg.prng_impl,
              cfg.compilation_cache_dir)
