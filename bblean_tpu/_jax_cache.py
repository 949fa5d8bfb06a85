r"""Persistent JAX compilation cache for the device engines.

JAX ships its persistent compile cache disabled; without it every ``bb run
--engine batch`` pays the full compile bill again (minutes at 10M-scale
table shapes on a tunneled TPU).  The device paths call
:func:`enable_persistent_cache` once before building any jitted program.

Respects an explicit user setting: if ``JAX_COMPILATION_CACHE_DIR`` is set
or the config was already updated, nothing is touched.  Disable with
``BBLEAN_TPU_NO_JAX_CACHE=1``.
"""

from __future__ import annotations

import os
from pathlib import Path

_DONE = False


def enable_persistent_cache() -> None:
    global _DONE
    if _DONE or os.getenv("BBLEAN_TPU_NO_JAX_CACHE"):
        return
    _DONE = True
    if os.getenv("JAX_COMPILATION_CACHE_DIR"):
        return  # user already chose a location
    import jax

    if jax.config.jax_compilation_cache_dir:
        return  # configured programmatically elsewhere
    cache = Path(
        os.getenv("XDG_CACHE_HOME", Path.home() / ".cache")
    ) / "bblean-tpu" / "jax"
    try:
        cache.mkdir(parents=True, exist_ok=True)
    except OSError:
        return  # read-only home: run without a persistent cache
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
