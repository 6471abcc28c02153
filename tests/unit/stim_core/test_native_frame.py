"""Native C++ frame sampler agrees with the Python FrameSampler."""

import numpy as np
import pytest

from tsim_tpu.stim_core.circuit import Circuit
from tsim_tpu.stim_core.frame import FrameSampler
from tsim_tpu.stim_core.native_frame import NativeFrameSampler


def _z_compare(circ_text, shots=40000, tol=4.6):
    c = Circuit(circ_text)
    m_py, d_py, o_py = FrameSampler(c, seed=5).sample(shots)
    m_nat, d_nat, o_nat = NativeFrameSampler(c, seed=9).sample(shots)
    for a_arr, b_arr in ((m_nat, m_py), (d_nat, d_py), (o_nat, o_py)):
        assert a_arr.shape == b_arr.shape
        if a_arr.shape[1] == 0:
            continue
        a, b = a_arr.mean(axis=0), b_arr.mean(axis=0)
        se = np.sqrt(a * (1 - a) / shots + b * (1 - b) / shots) + 1e-9
        assert (np.abs(a - b) / se).max() < tol, (a, b)


def test_bell_detector():
    _z_compare(
        "H 0\nCNOT 0 1\nX_ERROR(0.25) 0\nM 0 1\n"
        "DETECTOR rec[-1] rec[-2]\nOBSERVABLE_INCLUDE(0) rec[-1]"
    )


def test_random_measurement_is_uniform():
    c = Circuit("H 0\nM 0")
    m, _, _ = NativeFrameSampler(c, seed=0).sample(40000)
    assert abs(m.mean() - 0.5) < 0.01


def test_bases_and_resets():
    _z_compare(
        "RX 0\nRY 1\nH 2\nS 2\nMX 0\nMY 1\nMZ 2\n"
        "MRX 0\nMRY 1\nMR 2\nMX 0\nMY 1\nM 2"
    )


def test_noise_channels():
    _z_compare(
        "DEPOLARIZE1(0.3) 0\nDEPOLARIZE2(0.3) 1 2\n"
        "PAULI_CHANNEL_1(0.1, 0.15, 0.2) 3\n"
        "PAULI_CHANNEL_2(0.02,0.02,0.02,0.02,0.02,0.02,0.02,0.02,"
        "0.02,0.02,0.02,0.02,0.02,0.02,0.02) 0 3\n"
        "X_ERROR(0.2) 1\nY_ERROR(0.2) 2\nZ_ERROR(0.3) 2\nH 2\n"
        "M 0 1 2 3"
    )


def test_heralded_and_correlated():
    _z_compare(
        "HERALDED_ERASE(0.4) 0\nHERALDED_PAULI_CHANNEL_1(0.1,0.1,0.1,0.1) 1\n"
        "CORRELATED_ERROR(0.3) X0 Z1\nELSE_CORRELATED_ERROR(0.4) Y1\n"
        "M 0 1\nDETECTOR rec[-1]"
    )


def test_product_measurements():
    _z_compare(
        "H 0\nCNOT 0 1\nMZZ 0 1\nMXX 0 1\nMPP X0*X1 Z0*Z1\n"
        "DETECTOR rec[-4] rec[-2]"
    )


def test_rec_controlled_and_mpad():
    _z_compare(
        "H 0\nM 0\nCX rec[-1] 1\nM 1\nMPAD 0 1\n"
        "DETECTOR rec[-3] rec[-4]"
    )


def test_inverted_measurement_and_repeat():
    _z_compare(
        "X 0\nREPEAT 3 {\nCNOT 0 1\nX_ERROR(0.1) 1\nM 1\n}\n"
        "M !0\nDETECTOR rec[-2] rec[-3]"
    )


def test_surface_code_detector_rates():
    from tsim_tpu.models.surface_code import rotated_surface_code_memory_z

    c = rotated_surface_code_memory_z(
        3, 3, after_clifford_depolarization=0.02,
        before_measure_flip_probability=0.01,
    )
    shots = 40000
    _, d_py, o_py = FrameSampler(c, seed=1).sample(shots)
    _, d_nat, o_nat = NativeFrameSampler(c, seed=2).sample(shots)
    a, b = d_nat.mean(axis=0), d_py.mean(axis=0)
    se = np.sqrt(a * (1 - a) / shots + b * (1 - b) / shots) + 1e-9
    assert (np.abs(a - b) / se).max() < 4.6, (a, b)


def test_bit_packed_output():
    c = Circuit("X 0\nM 0 1")
    m, _, _ = NativeFrameSampler(c, seed=0).sample(70, bit_packed=True)
    assert m.shape == (70, 1) and (m == 1).all()  # bit0 set, bit1 clear


@pytest.mark.parametrize("shots", [1, 63, 64, 65, 130])
def test_nonmultiple_word_shots(shots):
    c = Circuit("X 0\nM 0")
    m, _, _ = NativeFrameSampler(c, seed=0).sample(shots)
    assert m.shape == (shots, 1) and m.all()
