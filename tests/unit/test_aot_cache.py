"""AOT compile-cache tests.

The cache memoizes (prepare_graph + compile_program) output keyed on the
circuit text + compile flags + a source-tree fingerprint, so a second
``compile_detector_sampler()`` of an identical circuit skips compilation
entirely (exceeds the reference, which recompiles every time — SURVEY.md
section 5.4).
"""

import time

import numpy as np
import pytest

from tsim_tpu.circuit import Circuit
from tsim_tpu.compile import aot_cache

CIRC = """
H 0
CNOT 0 1
T 1
X_ERROR(0.2) 0
M 0 1
DETECTOR rec[-1] rec[-2]
"""


@pytest.fixture(autouse=True)
def _fresh_cache():
    aot_cache.clear_memory()
    yield
    aot_cache.clear_memory()


def test_second_compile_skips_pipeline(monkeypatch):
    c = Circuit(CIRC)
    s1 = c.compile_detector_sampler(seed=0)

    import tsim_tpu.sampler as sampler_mod

    def _boom(*a, **k):  # pragma: no cover - failure path
        raise AssertionError("prepare_graph ran despite a warm cache")

    monkeypatch.setattr(sampler_mod, "prepare_graph", _boom)
    t0 = time.perf_counter()
    s2 = Circuit(CIRC).compile_detector_sampler(seed=0)
    assert time.perf_counter() - t0 < 1.0
    assert s2._program is s1._program  # shared immutable pytree


def test_cached_sampler_stream_matches(monkeypatch):
    """Seeded sample streams are identical with and without a cache hit."""
    a = Circuit(CIRC).compile_detector_sampler(seed=7).sample(300, batch_size=100)
    b = Circuit(CIRC).compile_detector_sampler(seed=7).sample(300, batch_size=100)
    np.testing.assert_array_equal(a, b)


def test_key_separates_modes_and_flags():
    k = aot_cache.cache_key
    base = k("H 0", sample_detectors=True, mode="sequential", strategy="cat5")
    assert k("H 0", sample_detectors=False, mode="sequential", strategy="cat5") != base
    assert k("H 0", sample_detectors=True, mode="joint", strategy="cat5") != base
    assert k("H 0", sample_detectors=True, mode="sequential", strategy="bss") != base
    assert k("H 1", sample_detectors=True, mode="sequential", strategy="cat5") != base
    assert k("H 0", sample_detectors=True, mode="sequential", strategy="cat5") == base


def test_disable_via_env(monkeypatch):
    monkeypatch.setenv("TSIM_TPU_COMPILE_CACHE", "0")
    c = Circuit(CIRC)
    c.compile_detector_sampler(seed=0)
    assert aot_cache.fetch(
        aot_cache.cache_key(
            str(c._stim_circ), sample_detectors=True, mode="sequential",
            strategy="cat5",
        )
    ) is None


def test_disk_roundtrip(tmp_path, monkeypatch):
    monkeypatch.setenv("TSIM_TPU_COMPILE_CACHE_DIR", str(tmp_path))
    c = Circuit(CIRC)
    s1 = c.compile_detector_sampler(seed=3)
    files = list(tmp_path.glob("aot_*.pkl"))
    assert len(files) == 1
    # A fresh process would miss the memory cache; simulate by clearing it.
    aot_cache.clear_memory()
    s2 = Circuit(CIRC).compile_detector_sampler(seed=3)
    a = s1.sample(200, batch_size=100)
    b = s2.sample(200, batch_size=100)
    np.testing.assert_array_equal(a, b)
