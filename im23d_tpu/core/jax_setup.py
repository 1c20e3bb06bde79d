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


class StepProfiler:
    """Trace a window of training steps (``--profile_dir`` on the train CLIs).

    ``tick()`` once per iteration: the trace starts at step ``start`` (past
    the compile/warm-up steps, which would otherwise dwarf the steady-state
    timeline) and stops after ``steps`` iterations.  ``close()`` is safe to
    call whether or not the window completed.
    """

    def __init__(self, log_dir: str, start: int = 12, steps: int = 5):
        self.log_dir = log_dir
        self.start = start
        self.stop = start + steps
        self._it = 0
        self._active = False

    def tick(self) -> None:
        import jax

        if self._it == self.start:
            jax.profiler.start_trace(self.log_dir)
            self._active = True
        elif self._it == self.stop and self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"wrote profiler trace (steps {self.start}-{self.stop}) "
                  f"to {self.log_dir}")
        self._it += 1

    def wrap(self, iterator):
        """Yield from ``iterator``, ticking once per item (for loops that
        live behind an API boundary, e.g. ``ShapeNetLearner.fit``)."""
        for item in iterator:
            self.tick()
            yield item

    def close(self) -> None:
        import jax

        if self._active:
            jax.profiler.stop_trace()
            self._active = False
            print(f"wrote PARTIAL profiler trace (steps {self.start}-"
                  f"{self._it} of a {self.start}-{self.stop} window) "
                  f"to {self.log_dir}")
        elif self._it <= self.start:
            print(f"profiler trace NOT captured: run ended after "
                  f"{self._it} iterations, before the capture window "
                  f"starting at step {self.start} (run longer, or lower "
                  f"the window start)")
