"""Postselection semantics matrix for CompiledDetectorSampler.

Mirrors the behavioral surface the reference pins in its postselection
suite (SURVEY.md section 4): validation, default-equivalence, discarded-row
semantics, the direct-detector prefilter (discarded shots never reach the
quantum evaluator), reference-XOR ordering, output layouts, and RNG
discipline.
"""

import numpy as np
import pytest

import tsim_tpu
import tsim_tpu.sampler as sampler_mod

# One direct detector (rate 0.3), one quantum (T-gate) detector + observable.
MIXED = """
X_ERROR(0.3) 0
M 0
DETECTOR rec[-1]
H 1
T 1
X_ERROR(0.1) 1
H 1
M 1
DETECTOR rec[-1]
OBSERVABLE_INCLUDE(0) rec[-1]
"""

DIRECT_ONLY = """
X_ERROR(0.3) 0
X_ERROR(0.2) 1
M 0 1
DETECTOR rec[-2]
DETECTOR rec[-1]
OBSERVABLE_INCLUDE(0) rec[-1]
"""


def _sampler(text=MIXED, seed=0):
    return tsim_tpu.Circuit(text).compile_detector_sampler(seed=seed)


def _mask(*idx, n=2):
    m = np.zeros(n, dtype=bool)
    for i in idx:
        m[i] = True
    return m


# ------------------------------------------------------------- validation
def test_mask_wrong_length_raises():
    with pytest.raises(ValueError, match="postselection_mask"):
        _sampler().sample(10, postselection_mask=np.zeros(3, bool))


def test_mask_wrong_shape_raises():
    with pytest.raises(ValueError, match="postselection_mask"):
        _sampler().sample(10, postselection_mask=np.zeros((2, 1), bool))


def test_negative_shots_raises():
    with pytest.raises(ValueError, match="shots"):
        _sampler().sample(-1, postselection_mask=_mask(0))


def test_invalid_batch_size_raises():
    with pytest.raises(ValueError, match="batch_size"):
        _sampler().sample(10, batch_size=0, postselection_mask=_mask(0))


# --------------------------------------------------------- mask coercion
def test_coerce_mask_none_passthrough():
    assert _sampler()._coerce_postselection_mask(None) is None


def test_coerce_mask_collapses_without_direct_overlap():
    # MIXED's detector 1 is component-backed: a mask selecting only it
    # gives the prefilter nothing to act on, so it collapses to None.
    s = _sampler()
    direct = np.asarray(s._direct_detector_mask)
    non_direct = _mask(*np.flatnonzero(~direct))
    assert s._coerce_postselection_mask(non_direct) is None


def test_coerce_mask_collapses_on_fully_direct_program():
    s = tsim_tpu.Circuit(DIRECT_ONLY).compile_detector_sampler(seed=0)
    assert s._coerce_postselection_mask(_mask(0)) is None


def test_coerce_mask_keeps_prefilterable_mask():
    s = _sampler()
    direct = np.flatnonzero(np.asarray(s._direct_detector_mask))
    kept = s._coerce_postselection_mask(_mask(direct[0]))
    assert kept is not None and kept.dtype == np.bool_ and kept[direct[0]]


def test_coerce_mask_accepts_int_array():
    s = _sampler()
    direct = np.flatnonzero(np.asarray(s._direct_detector_mask))
    as_int = np.zeros(2, dtype=np.int64)
    as_int[direct[0]] = 1
    kept = s._coerce_postselection_mask(as_int)
    assert kept is not None and kept.dtype == np.bool_


# --------------------------------------------------------- defaults/shape
def test_none_mask_matches_default():
    a = _sampler(seed=3).sample(500, batch_size=500)
    b = _sampler(seed=3).sample(500, batch_size=500, postselection_mask=None)
    np.testing.assert_array_equal(a, b)


def test_all_false_mask_matches_default():
    a = _sampler(seed=3).sample(500, batch_size=500)
    b = _sampler(seed=3).sample(
        500, batch_size=500, postselection_mask=_mask()
    )
    np.testing.assert_array_equal(a, b)


def test_return_shape_preserved():
    det = _sampler().sample(321, batch_size=128, postselection_mask=_mask(0))
    assert det.shape == (321, 2)


def test_zero_shots():
    det = _sampler().sample(0, postselection_mask=_mask(0))
    assert det.shape == (0, 2)


# ---------------------------------------------------- discarded-row rules
def test_discarded_rows_component_cols_false():
    s = _sampler(seed=5)
    det, obs = s.sample(
        4000, batch_size=512, postselection_mask=_mask(0),
        separate_observables=True,
    )
    discarded = det[:, 0]
    # Quantum columns of discarded shots are never computed -> False.
    assert not det[discarded, 1].any()
    assert not obs[discarded, 0].any()
    # Survivors carry live T-detector statistics (~sin^2(pi/8) + error mix).
    survivors = ~discarded
    assert 0.05 < det[survivors, 1].mean() < 0.5
    assert abs(discarded.mean() - 0.3) < 0.04


def test_direct_cols_always_populated():
    det = _sampler(seed=6).sample(
        4000, batch_size=512, postselection_mask=_mask(0)
    )
    assert abs(det[:, 0].mean() - 0.3) < 0.04


def test_quantum_evaluator_skipped_for_direct_discards(monkeypatch):
    s = _sampler(seed=7)
    batches = []
    orig = sampler_mod._program_runner_packed

    def spy(program, example_f, mesh=None):
        fn = orig(program, example_f, mesh=mesh)

        def wrapped(f_params, key):
            batches.append(f_params.shape[0])
            return fn(f_params, key)

        return wrapped

    monkeypatch.setattr(sampler_mod, "_program_runner_packed", spy)
    shots = 2000
    det = s.sample(shots, batch_size=500, postselection_mask=_mask(0))
    # Roughly 30% of shots discard before ever reaching the evaluator, and
    # every dispatched batch keeps the fixed jit shape.
    assert sum(batches) < shots
    assert set(batches) == {500}
    assert det.shape == (shots, 2)


def test_non_direct_mask_entry_is_ignored_for_prefilter():
    # Masking only the quantum detector cannot prefilter anything.
    a = _sampler(seed=8).sample(500, batch_size=500)
    b = _sampler(seed=8).sample(
        500, batch_size=500, postselection_mask=_mask(1)
    )
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------- fully direct path
def test_fully_direct_no_quantum(monkeypatch):
    def boom(program, *a):
        raise AssertionError("quantum evaluator must not run")

    monkeypatch.setattr(sampler_mod, "_program_runner", boom)
    monkeypatch.setattr(sampler_mod, "_program_runner_hoisted", boom)
    s = _sampler(DIRECT_ONLY, seed=9)
    det = s.sample(3000, batch_size=512, postselection_mask=_mask(0))
    assert abs(det[:, 0].mean() - 0.3) < 0.05
    assert abs(det[:, 1].mean() - 0.2) < 0.05


def test_fully_direct_matches_default():
    a = _sampler(DIRECT_ONLY, seed=10).sample(800, batch_size=800)
    b = _sampler(DIRECT_ONLY, seed=10).sample(
        800, batch_size=800, postselection_mask=_mask(0, 1)
    )
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------ reference XOR rules
def test_detector_reference_with_postselection():
    s = _sampler(seed=11)
    det = s.sample(
        2000, batch_size=512, postselection_mask=_mask(0),
        use_detector_reference_sample=True,
    )
    # The direct detector's reference value is 0 here, so rates match.
    assert abs(det[:, 0].mean() - 0.3) < 0.05


def test_observable_reference_only_on_survivors():
    s = _sampler(seed=12)
    det, obs = s.sample(
        3000, batch_size=512, postselection_mask=_mask(0),
        separate_observables=True, use_observable_reference_sample=True,
    )
    discarded = det[:, 0]
    # Discarded rows never get the observable reference XORed in.
    assert not obs[discarded, 0].any()


def test_reference_does_not_advance_channel_rng():
    a = _sampler(seed=13).sample(400, batch_size=400,
                                 postselection_mask=_mask(0))
    b = _sampler(seed=13).sample(
        400, batch_size=400, postselection_mask=_mask(0),
        use_detector_reference_sample=False,
        use_observable_reference_sample=False,
    )
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------ output layout
def test_output_layout_append_observables():
    out = _sampler(seed=14).sample(
        200, batch_size=200, postselection_mask=_mask(0),
        append_observables=True,
    )
    assert out.shape == (200, 3)


def test_output_layout_prepend_observables():
    out = _sampler(seed=14).sample(
        200, batch_size=200, postselection_mask=_mask(0),
        prepend_observables=True,
    )
    assert out.shape == (200, 3)


def test_output_layout_separate_observables():
    det, obs = _sampler(seed=14).sample(
        200, batch_size=200, postselection_mask=_mask(0),
        separate_observables=True,
    )
    assert det.shape == (200, 2) and obs.shape == (200, 1)


def test_output_layout_bit_packed():
    det = _sampler(seed=14).sample(
        200, batch_size=200, postselection_mask=_mask(0), bit_packed=True,
    )
    assert det.shape == (200, 1) and det.dtype == np.uint8


# ------------------------------------------------- discarded/surviving mix
ALWAYS_DISCARD = """
X_ERROR(1) 0
M 0
DETECTOR rec[-1]
H 1
T 1
X_ERROR(0.1) 1
H 1
M 1
DETECTOR rec[-1]
"""

# Direct detector + direct observable + quantum detector: discarded rows
# must keep the direct detector column but zero the direct observable.
DIRECT_OBS_MIXED = """
X_ERROR(0.3) 0
M 0
DETECTOR rec[-1]
X_ERROR(0.1) 1
M 1
OBSERVABLE_INCLUDE(0) rec[-1]
H 2
T 2
X_ERROR(0.1) 2
H 2
M 2
DETECTOR rec[-1]
"""


def _spy_batches(monkeypatch):
    """Record the batch shape of every quantum-evaluator dispatch."""
    batches = []
    orig = sampler_mod._program_runner_packed

    def spy(program, example_f, mesh=None):
        fn = orig(program, example_f, mesh=mesh)

        def wrapped(f_params, key):
            batches.append(f_params.shape[0])
            return fn(f_params, key)

        return wrapped

    monkeypatch.setattr(sampler_mod, "_program_runner_packed", spy)
    return batches


def test_discarded_and_surviving_rows():
    det = _sampler(seed=21).sample(
        600, batch_size=64, postselection_mask=_mask(0)
    )
    discarded = det[:, 0]
    assert discarded.any() and (~discarded).any()
    assert not det[discarded, 1].any()


def test_direct_cols_match_direct_compute(monkeypatch):
    """The direct detector column equals the host-side direct computation
    of the exact channel draws, for every row (discarded or not)."""
    s = _sampler(seed=22)
    drawn = []
    orig = s._channel_sampler.sample

    def capture(n):
        batch = orig(n)
        drawn.append(np.array(batch, copy=True))
        return batch

    monkeypatch.setattr(s._channel_sampler, "sample", capture)
    det = s.sample(64, batch_size=16, postselection_mask=_mask(0))
    f_all = np.concatenate(drawn)[: det.shape[0]]
    expect = s._compute_direct_outputs(f_all)[:, : s._num_detectors]
    direct = s._direct_detector_mask
    np.testing.assert_array_equal(det & direct, expect & direct)


def test_all_discard_skips_quantum_entirely(monkeypatch):
    batches = _spy_batches(monkeypatch)
    det = _sampler(ALWAYS_DISCARD, seed=23).sample(
        40, batch_size=8, postselection_mask=_mask(0)
    )
    assert det[:, 0].all()
    assert not det[:, 1].any()
    assert batches == []


def test_quantum_rows_cover_all_survivors(monkeypatch):
    batches = _spy_batches(monkeypatch)
    det = _sampler(seed=24).sample(
        2000, batch_size=500, postselection_mask=_mask(0)
    )
    survivors = int((~det[:, 0]).sum())
    assert survivors < sum(batches) < 2000 or sum(batches) == survivors


def test_uniform_batch_shape_with_partial_final(monkeypatch):
    """Every dispatched batch keeps the compiled shape, including the final
    padded remainder — jit never sees a second shape."""
    batches = _spy_batches(monkeypatch)
    det = _sampler(seed=25).sample(
        777, batch_size=128, postselection_mask=_mask(0)
    )
    assert det.shape == (777, 2)
    assert batches and set(batches) == {128}


def test_detector_reference_xor_applies_before_discard_check(monkeypatch):
    """A deterministically-firing masked detector discards everything with
    the reference off, but survives once the reference XOR cancels it."""
    text = "X 0\n" + MIXED
    batches_off = _spy_batches(monkeypatch)
    _sampler(text, seed=26).sample(
        64, batch_size=16, postselection_mask=_mask(0)
    )
    n_off = sum(batches_off)
    del batches_off[:]
    _sampler(text, seed=26).sample(
        64, batch_size=16, postselection_mask=_mask(0),
        use_detector_reference_sample=True,
    )
    assert sum(batches_off) > n_off


def test_observable_reference_xor_only_on_quantum_rows():
    """With a deterministically-set observable, the reference XOR flips
    survivor rows but never the discarded rows' uncomputed columns."""
    text = MIXED + "X 2\nM 2\nOBSERVABLE_INCLUDE(1) rec[-1]\n"
    s = _sampler(text, seed=27)
    det, obs = s.sample(
        400, batch_size=64, postselection_mask=_mask(0),
        separate_observables=True, use_observable_reference_sample=True,
    )
    discarded = det[:, 0]
    assert discarded.any() and (~discarded).any()
    # Observable 1 fires deterministically; its reference is 1, so the XOR
    # zeroes survivors while discarded rows stay zero (never computed).
    assert not obs[:, 1].any()


def test_fully_direct_detector_reference_matches_unmasked():
    a = _sampler(DIRECT_ONLY, seed=28).sample(
        60, batch_size=60, postselection_mask=_mask(0),
        use_detector_reference_sample=True,
    )
    b = _sampler(DIRECT_ONLY, seed=28).sample(
        60, batch_size=60, use_detector_reference_sample=True
    )
    np.testing.assert_array_equal(a, b)


def test_all_false_mask_detector_reference_matches_unmasked():
    a = _sampler(seed=29).sample(
        80, batch_size=16, postselection_mask=_mask(),
        use_detector_reference_sample=True,
    )
    b = _sampler(seed=29).sample(
        80, batch_size=16, use_detector_reference_sample=True
    )
    np.testing.assert_array_equal(a, b)


def test_detector_reference_survivors_and_discarded():
    """The detector reference XOR lands on both row kinds: all columns for
    survivors, only direct columns for discarded rows."""
    text = "X 0\n" + MIXED  # det0 reference value is 1
    s = _sampler(text, seed=30)
    det = s.sample(
        400, batch_size=64, postselection_mask=_mask(0),
        use_detector_reference_sample=True,
    )
    # After the XOR, det0 reads the raw error rate again (0.3) on every
    # row; the discard decision itself used the XORed value.
    assert abs(det[:, 0].mean() - 0.3) < 0.08
    discarded = det[:, 0]
    assert not det[discarded, 1].any()


def test_discarded_rows_zero_direct_observable():
    s = _sampler(DIRECT_OBS_MIXED, seed=31)
    assert s._direct_output_mask[s._num_detectors:].any()
    det, obs = s.sample(
        600, batch_size=64, postselection_mask=_mask(0),
        separate_observables=True,
    )
    discarded = det[:, 0]
    assert discarded.any() and (~discarded).any()
    assert not obs[discarded, 0].any()
    assert 0.02 < obs[~discarded, 0].mean() < 0.25


# ------------------------------------------------- surface-code integration
def test_surface_code_fully_direct_unchanged():
    from tsim_tpu.models.surface_code import generated

    c = generated(
        "surface_code:rotated_memory_x", distance=3, rounds=2,
        after_clifford_depolarization=0.01,
    )
    assert c.compile_detector_sampler(seed=0)._direct_detector_mask.all()
    mask = np.zeros(c.num_detectors, dtype=np.bool_)
    a = c.compile_detector_sampler(seed=32).sample(100, batch_size=32)
    b = c.compile_detector_sampler(seed=32).sample(
        100, batch_size=32, postselection_mask=mask
    )
    np.testing.assert_array_equal(a, b)


def test_surface_code_caller_filter():
    from tsim_tpu.models.surface_code import generated

    c = generated(
        "surface_code:rotated_memory_x", distance=3, rounds=2,
        after_clifford_depolarization=0.01,
    )
    mask = np.zeros(c.num_detectors, dtype=np.bool_)
    mask[0] = True
    det = c.compile_detector_sampler(seed=33).sample(
        200, batch_size=64, postselection_mask=mask
    )
    survivors = ~np.any(det & mask, axis=1)
    assert survivors.any()
    assert not np.any(det[survivors] & mask)
