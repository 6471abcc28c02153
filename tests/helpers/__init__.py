import pytest


def requires_native_planner():
    """Skip marker for tests that pin exact planner term counts.

    The pinned counts were measured with the native (C++) matching search;
    the Python fallback ILS uses a different RNG stream and can settle on a
    different (still valid) plan, so exact pins would fail spuriously on
    hosts without g++ or with TSIM_TPU_NATIVE_ZX=0.
    """
    from tsim_tpu.zx import native_simplify as ns

    return pytest.mark.skipif(
        ns._load() is None, reason="exact term pins require the native planner"
    )
