"""Sampler behavior tests: batching, reference samples, layouts, repr."""

import numpy as np
import pytest

import tsim_tpu


@pytest.fixture(scope="module")
def bell_sampler():
    c = tsim_tpu.Circuit(
        """
        H 0
        CNOT 0 1
        X_ERROR(0.3) 0
        M 0 1
        DETECTOR rec[-1] rec[-2]
        OBSERVABLE_INCLUDE(0) rec[-1]
        """
    )
    return c.compile_detector_sampler(seed=0)


def test_detector_rate(bell_sampler):
    det = bell_sampler.sample(4000, batch_size=4000)
    assert det.shape == (4000, 1)
    assert abs(det.mean() - 0.3) < 0.03


def test_observable_layouts(bell_sampler):
    det, obs = bell_sampler.sample(100, batch_size=100, separate_observables=True)
    assert det.shape == (100, 1) and obs.shape == (100, 1)
    both = bell_sampler.sample(100, batch_size=100, append_observables=True)
    assert both.shape == (100, 2)
    pre = bell_sampler.sample(100, batch_size=100, prepend_observables=True)
    assert pre.shape == (100, 2)
    packed = bell_sampler.sample(100, batch_size=100, bit_packed=True)
    assert packed.dtype == np.uint8 and packed.shape == (100, 1)
    with pytest.raises(ValueError):
        bell_sampler.sample(10, separate_observables=True, append_observables=True)


def test_zero_shots(bell_sampler):
    out = bell_sampler.sample(0, batch_size=16)
    assert out.shape == (0, 1)


def test_shots_not_multiple_of_batch(bell_sampler):
    out = bell_sampler.sample(257, batch_size=100)
    assert out.shape == (257, 1)


def test_seeded_determinism():
    c = tsim_tpu.Circuit("H 0\nT 0\nH 0\nX_ERROR(0.2) 0\nM 0")
    a = c.compile_sampler(seed=5).sample(500, batch_size=100)
    b = c.compile_sampler(seed=5).sample(500, batch_size=100)
    np.testing.assert_array_equal(a, b)
    c2 = c.compile_sampler(seed=6).sample(500, batch_size=100)
    assert not np.array_equal(a, c2)


def test_reference_sample_xor():
    # Deterministic-one detector: reference XOR flips it to zero.
    c = tsim_tpu.Circuit(
        """
        R 0
        X 0
        X_ERROR(0.25) 0
        M 0
        DETECTOR rec[-1]
        """
    )
    s = c.compile_detector_sampler(seed=1)
    raw = s.sample(3000, batch_size=3000)
    assert abs(raw.mean() - 0.75) < 0.04  # raw parity is 1 unless error
    flips = s.sample(3000, batch_size=3000, use_detector_reference_sample=True)
    assert abs(flips.mean() - 0.25) < 0.04


def test_measurement_sampler_shapes():
    c = tsim_tpu.Circuit("H 0\nCNOT 0 1\nM 0 1")
    out = c.compile_sampler(seed=0).sample(128, batch_size=64)
    assert out.shape == (128, 2)
    assert (out[:, 0] == out[:, 1]).all()


def test_repr_stats(bell_sampler):
    r = repr(bell_sampler)
    assert "CompiledDetectorSampler" in r
    assert "direct" in r and "graphs" in r


def test_postselection_mask():
    c = tsim_tpu.Circuit(
        """
        H 0
        CNOT 0 1
        X_ERROR(0.4) 0
        T 1
        M 0 1
        DETECTOR rec[-1] rec[-2]
        DETECTOR rec[-1]
        OBSERVABLE_INCLUDE(0) rec[-2]
        """
    )
    s = c.compile_detector_sampler(seed=2)
    mask = np.array([True, False])
    det, obs = s.sample(
        500, batch_size=128, separate_observables=True, postselection_mask=mask
    )
    assert det.shape == (500, 2)
    # masked direct detector: discarded rows keep the detector column
    survivors = ~det[:, 0]
    assert survivors.sum() > 0


def test_probability_of_validation():
    c = tsim_tpu.Circuit("H 0\nM 0")
    sp = c.compile_state_probs(seed=0)
    with pytest.raises(ValueError, match="batch_size"):
        sp.probability_of(np.array([0]), batch_size=0)
    with pytest.raises(ValueError, match="shape"):
        sp.probability_of(np.array([0, 1]), batch_size=1)


def test_negative_shots(bell_sampler):
    with pytest.raises(ValueError, match="non-negative"):
        bell_sampler.sample(-1)
    with pytest.raises(ValueError, match="at least 1"):
        bell_sampler.sample(10, batch_size=0)


def test_norm_deviation_warns_and_raises():
    import warnings

    import tsim_tpu.sampler as S

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        S._check_norm_deviation(np.array([5e-4]))
        assert any("normalized correctly" in str(x.message) for x in w)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        S._check_norm_deviation(np.array([1e-9]))
        assert not w
    with pytest.raises(ValueError, match="underflow"):
        S._check_norm_deviation(np.array([1.0]))


def test_native_direct_path_statistics(monkeypatch):
    """Fully-direct Clifford circuits ride the native frame sampler."""
    monkeypatch.setenv("TSIM_TPU_NATIVE_DIRECT", "1")
    from tsim_tpu.models.surface_code import rotated_surface_code_memory_z

    c = rotated_surface_code_memory_z(
        3, 3, after_clifford_depolarization=0.02,
        before_measure_flip_probability=0.02,
    )
    s = c.compile_detector_sampler(seed=11)
    assert s._native_frame_sampler() is not None
    det, obs = s.sample(40000, separate_observables=True)
    monkeypatch.delenv("TSIM_TPU_NATIVE_DIRECT")
    s2 = c.compile_detector_sampler(seed=12)
    det2, obs2 = s2.sample(40000, separate_observables=True)
    a, b = det.mean(axis=0), det2.mean(axis=0)
    sig = np.sqrt(a * (1 - a) / 4e4 + b * (1 - b) / 4e4) + 1e-9
    assert (np.abs(a - b) / sig).max() < 5.5, (a, b)


def test_native_direct_deterministic_one_detector(monkeypatch):
    """Frame-sampler flips are converted to absolute detector values."""
    monkeypatch.setenv("TSIM_TPU_NATIVE_DIRECT", "1")
    c = tsim_tpu.Circuit(
        "R 0\nX 0\nX_ERROR(0.25) 0\nM 0\nDETECTOR rec[-1]\n"
        "OBSERVABLE_INCLUDE(0) rec[-1]"
    )
    s = c.compile_detector_sampler(seed=2)
    assert s._native_frame_sampler() is not None
    det, obs = s.sample(4000, separate_observables=True)
    assert abs(det.mean() - 0.75) < 0.04
    assert abs(obs.mean() - 0.75) < 0.04
    packed = s.sample(4000, bit_packed=True)
    assert abs(np.unpackbits(packed, axis=1, bitorder="little")[:, 0].mean() - 0.75) < 0.04


class TestConstantDirectDetectors:
    """Deterministic (noise-free) detectors classify as direct constants
    instead of compiling a quantum ladder (reference keeps them implicit;
    we mask them out of the direct f-column gather)."""

    CIRCUIT = """
        X 0
        X_ERROR(0.4) 1
        M 0 1
        DETECTOR rec[-2]
        DETECTOR rec[-1]
        OBSERVABLE_INCLUDE(0) rec[-1]
    """

    def test_constant_one_and_zero(self):
        import tsim_tpu

        s = tsim_tpu.Circuit(self.CIRCUIT).compile_detector_sampler(seed=3)
        assert len(s._program.components) == 0  # fully direct
        out = s.sample(4096, batch_size=4096)
        assert out[:, 0].all()  # X 0 -> M deterministic 1
        rate = out[:, 1].mean()
        assert 0.35 < rate < 0.45

    def test_matches_native_frame_path(self):
        import os
        import tsim_tpu

        s = tsim_tpu.Circuit(self.CIRCUIT).compile_detector_sampler(seed=3)
        host = s.sample(20000, batch_size=20000)
        os.environ["TSIM_TPU_NATIVE_DIRECT"] = "1"
        try:
            s2 = tsim_tpu.Circuit(self.CIRCUIT).compile_detector_sampler(seed=3)
            native = s2.sample(20000, batch_size=20000)
        finally:
            del os.environ["TSIM_TPU_NATIVE_DIRECT"]
        assert native[:, 0].all()
        assert abs(host[:, 1].mean() - native[:, 1].mean()) < 0.02


# ---------------------------------------------------------- batch discipline
# The quantum path dispatches through one jit per (program, batch_size):
# every batch must share one shape (no retraces), the batch count must be
# exactly ceil(shots / batch_size), and the reference sample must not
# perturb batching (it rides a separate hoisted 1-row runner).

QUANTUM_TEXT = "H 0\nT 0\nX_ERROR(0.15) 0\nH 0\nM 0\nDETECTOR rec[-1]"


def _spy_run_fn(monkeypatch):
    """Record (num_batches, batch_size) of every _device_run_fn build and
    the per-call dispatch count."""
    import tsim_tpu.sampler as sampler_mod

    seen = {"builds": [], "calls": 0}
    orig = sampler_mod._device_run_fn

    def spy(program, device_channels, num_batches, batch_size, mesh=None):
        seen["builds"].append((num_batches, batch_size))
        fn = orig(program, device_channels, num_batches, batch_size, mesh=mesh)

        def wrapped(base_key, bi):
            seen["calls"] += 1
            return fn(base_key, bi)

        return wrapped

    monkeypatch.setattr(sampler_mod, "_device_run_fn", spy)
    return seen


def _quantum_sampler(seed=0):
    import tsim_tpu

    return tsim_tpu.Circuit(QUANTUM_TEXT).compile_detector_sampler(seed=seed)


def test_auto_batch_uniform(monkeypatch):
    s = _quantum_sampler()
    monkeypatch.setattr(type(s), "_estimate_batch_size", lambda self: 30)
    seen = _spy_run_fn(monkeypatch)
    out = s.sample(100)
    assert out.shape == (100, 1)
    assert seen["builds"] == [(4, 25)]
    assert seen["calls"] == 4


def test_auto_batch_non_divisible(monkeypatch):
    s = _quantum_sampler()
    monkeypatch.setattr(type(s), "_estimate_batch_size", lambda self: 30)
    seen = _spy_run_fn(monkeypatch)
    out = s.sample(101)
    assert out.shape == (101, 1)
    assert seen["builds"] == [(4, 26)]
    assert seen["calls"] == 4


def test_auto_batch_single_when_estimate_large(monkeypatch):
    s = _quantum_sampler()
    monkeypatch.setattr(type(s), "_estimate_batch_size", lambda self: 10**6)
    seen = _spy_run_fn(monkeypatch)
    out = s.sample(100)
    assert out.shape == (100, 1)
    assert seen["builds"] == [(1, 100)]
    assert seen["calls"] == 1


def test_explicit_batch_exact_count(monkeypatch):
    s = _quantum_sampler()
    seen = _spy_run_fn(monkeypatch)
    out = s.sample(100, batch_size=50)
    assert out.shape == (100, 1)
    assert seen["builds"] == [(2, 50)]
    assert seen["calls"] == 2


def test_explicit_batch_partial_final_keeps_shape(monkeypatch):
    s = _quantum_sampler()
    seen = _spy_run_fn(monkeypatch)
    out = s.sample(101, batch_size=50)
    assert out.shape == (101, 1)
    # Three dispatches, all at the compiled batch shape of 50; the final
    # batch's surplus rows are trimmed host-side after unpacking.
    assert seen["builds"] == [(3, 50)]
    assert seen["calls"] == 3


def test_reference_sample_does_not_change_batching(monkeypatch):
    a = _quantum_sampler(seed=4)
    seen_a = _spy_run_fn(monkeypatch)
    a.sample(100, batch_size=50)
    plain = (list(seen_a["builds"]), seen_a["calls"])
    monkeypatch.undo()

    b = _quantum_sampler(seed=4)
    seen_b = _spy_run_fn(monkeypatch)
    b.sample(100, batch_size=50, use_detector_reference_sample=True)
    assert (list(seen_b["builds"]), seen_b["calls"]) == plain


# ----------------------------------------------------------- empty shapes
def test_zero_shots_with_reference(bell_sampler):
    out = bell_sampler.sample(
        0, append_observables=True, use_detector_reference_sample=True
    )
    assert out.shape == (0, 2)


def test_measurement_sampler_no_measurements():
    import tsim_tpu

    out = tsim_tpu.Circuit("H 0").compile_sampler().sample(5)
    assert out.dtype == np.bool_ and out.shape == (5, 0)


def test_detector_sampler_no_detectors():
    import tsim_tpu

    s = tsim_tpu.Circuit("H 0\nM 0").compile_detector_sampler()
    out = s.sample(5)
    assert out.dtype == np.bool_ and out.shape == (5, 0)
    det, obs = s.sample(5, separate_observables=True)
    assert det.shape == (5, 0) and obs.shape == (5, 0)


def test_detector_sampler_no_detectors_bit_packed_and_reference():
    import tsim_tpu

    s = tsim_tpu.Circuit("H 0\nM 0").compile_detector_sampler()
    packed = s.sample(5, bit_packed=True)
    assert packed.dtype == np.uint8 and packed.shape == (5, 0)
    ref = s.sample(5, use_detector_reference_sample=True)
    assert ref.shape == (5, 0)


# ------------------------------------------------------ annotation columns
def test_empty_annotations_are_deterministic_zero():
    import tsim_tpu

    c = tsim_tpu.Circuit(
        "X 0\nM 0 1\nDETECTOR rec[-2]\nDETECTOR\n"
        "OBSERVABLE_INCLUDE(0) rec[-1]\nOBSERVABLE_INCLUDE(1)"
    )
    assert c.num_detectors == 2 and c.num_observables == 2
    det, obs = c.compile_detector_sampler(seed=0).sample(
        4, separate_observables=True
    )
    assert det[:, 0].all() and not det[:, 1].any() and not obs.any()


def test_sparse_observable_index_pads_columns():
    import tsim_tpu

    c = tsim_tpu.Circuit("X 0\nM 0\nOBSERVABLE_INCLUDE(2) rec[-1]")
    assert c.num_observables == 3
    out = c.compile_detector_sampler(seed=0).sample(4, append_observables=True)
    assert out.shape == (4, 3)
    assert not out[:, :2].any() and out[:, 2].all()


def test_out_of_order_observable_indices_sort():
    import tsim_tpu

    c = tsim_tpu.Circuit(
        "X 0\nM 0 1\nOBSERVABLE_INCLUDE(2) rec[-2]\n"
        "OBSERVABLE_INCLUDE(0) rec[-1]"
    )
    assert c.num_observables == 3
    _, obs = c.compile_detector_sampler(seed=0).sample(
        2, separate_observables=True
    )
    assert obs.shape == (2, 3)
    assert not obs[:, 0].any() and not obs[:, 1].any() and obs[:, 2].all()
