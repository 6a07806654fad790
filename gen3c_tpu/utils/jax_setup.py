"""Process-wide JAX setup: persistent compilation cache.

Remote TPU compiles in this environment cost 20-300s per program; the
on-disk cache makes second runs of any CLI/bench start warm. Called by
the entry points (factory.build_gen3c_model, bench.py).
"""

from __future__ import annotations

import os

_DONE = False


def setup_jax(cache_dir: str | None = None) -> None:
    global _DONE
    if _DONE:
        return
    import jax

    cache_dir = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
            ".jax_cache",
        ),
    )
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    except Exception:  # noqa: BLE001
        pass
    _DONE = True
