"""Clifford-rotation expansion and transversal encoders."""

import numpy as np

import tsim_tpu
from tsim_tpu.stim_core.frame import FrameSampler
from tsim_tpu.utils.clifford import (
    expand_clifford_rotations,
    is_clifford,
    parametric_to_clifford_gates,
)
from tsim_tpu.utils.encoder import ColorEncoder5, SteaneEncoder


def test_half_pi_rotations_map_to_clifford_gates():
    from fractions import Fraction

    assert parametric_to_clifford_gates("R_Z", {"theta": Fraction(1, 2)}) == ["S"]
    assert parametric_to_clifford_gates("R_Z", {"theta": Fraction(3, 2)}) == ["S_DAG"]
    assert parametric_to_clifford_gates("R_Z", {"theta": Fraction(1)}) == ["Z"]
    assert parametric_to_clifford_gates("R_Z", {"theta": Fraction(1, 4)}) is None


def test_is_clifford():
    assert is_clifford(tsim_tpu.Circuit("H 0\nS 0\nCZ 0 1\nM 0")._stim_circ)
    assert not is_clifford(tsim_tpu.Circuit("T 0")._stim_circ)
    assert is_clifford(tsim_tpu.Circuit("R_Z(0.5) 0")._stim_circ)
    assert not is_clifford(tsim_tpu.Circuit("R_Z(0.3) 0")._stim_circ)


def test_expand_clifford_rotations_matrix_equal():
    c = tsim_tpu.Circuit("R_Z(0.5) 0\nR_X(1.5) 0")
    expanded = expand_clifford_rotations(c._stim_circ)
    a = c.to_matrix()
    b = tsim_tpu.Circuit(str(expanded)).to_matrix()
    k = np.flatnonzero(np.abs(a) > 1e-9)[0]
    np.testing.assert_allclose(a, b * (a.flat[k] / b.flat[k]), atol=1e-7)


def _encoder_detectors_silent(encoder, logical):
    encoder.initialize("R 0")
    encoder.encode_transversally(logical)
    circ = encoder.circuit
    assert is_clifford(circ._stim_circ)
    _, dets, _ = FrameSampler(circ, seed=0).sample(256)
    assert dets.shape[1] > 0
    assert not dets.any()


def test_steane_encoder_noiseless_detectors_silent():
    # Logical identity + transversal stabilizer measurement: every detector
    # compares a stabilizer generator against its deterministic value.
    enc = SteaneEncoder()
    _encoder_detectors_silent(
        enc,
        """
        MPP Z0
        DETECTOR rec[-1]
        """,
    )


def test_color_code_encoder_noiseless_detectors_silent():
    enc = ColorEncoder5()
    _encoder_detectors_silent(
        enc,
        """
        MPP Z0
        DETECTOR rec[-1]
        """,
    )


def test_steane_logical_observable_deterministic():
    enc = SteaneEncoder()
    enc.initialize("R 0")
    enc.encode_transversally(
        "X 0\nMPP Z0\nOBSERVABLE_INCLUDE(0) rec[-1]"
    )
    m, dets, obs = FrameSampler(enc.circuit, seed=1).sample(256)
    assert obs.shape[1] == 1
    assert obs.all()  # logical X flips the logical Z outcome deterministically


def test_all_diagram_types_render():
    import tsim_tpu

    c = tsim_tpu.Circuit("H 0\nTICK\nCNOT 0 1\nT 1\nTICK\nM 0 1\nDETECTOR rec[-1]")
    for ty in ("timeline-svg", "timeslice-svg", "pyzx", "pyzx-dets", "pyzx-meas"):
        svg = str(c.diagram(ty))
        assert svg.startswith("<svg"), ty
    import pytest

    with pytest.raises(ValueError, match="Unknown diagram type"):
        c.diagram("nope")
