"""Profiling hooks: JAX trace capture around sampling runs.

The sampler's ``__repr__`` and ``compile_stats`` cover compile-time
observability (reference ``tsim/sampler.py:557-609`` repr-as-dashboard);
this adds the device-side half (SURVEY.md section 5.1): a context manager
that captures a ``jax.profiler`` trace viewable in TensorBoard/Perfetto.

    from tsim_tpu.utils.profiling import trace

    with trace("/tmp/tsim-trace"):
        sampler.sample(1_000_000)
"""

from __future__ import annotations

import contextlib


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a JAX device trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir, create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region inside a trace (``with annotate("ladder"): ...``)."""
    import jax

    return jax.profiler.TraceAnnotation(name)
