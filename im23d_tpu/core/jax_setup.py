"""Process-level JAX setup: persistent compilation cache.

The heavy train-step graphs (GAN g/d steps, recon step) take minutes to
compile; the persistent cache makes repeated CLI invocations start in
seconds.  Call ``setup_jax()`` once at entry-point start.
"""

from __future__ import annotations

import os


def setup_jax(cache_dir: str | None = None) -> None:
    import jax

    cache_dir = cache_dir or os.environ.get(
        "IM23D_JAX_CACHE", os.path.expanduser("~/.cache/im23d_jax")
    )
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # older jax or read-only fs: run without the cache


def trace_profile(log_dir: str):
    """Context manager: capture a jax.profiler trace (TensorBoard-viewable).

    The reference's only tracing is wall-clock prints (SURVEY §5); this gives
    full XLA op-level traces: ``with trace_profile(dir): run_steps()``.
    """
    import jax

    return jax.profiler.trace(log_dir)
