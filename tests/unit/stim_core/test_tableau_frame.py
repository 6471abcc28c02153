"""Tableau + frame simulator tests against the statevector oracle."""

import numpy as np
import pytest

import tsim_tpu
from tests.helpers.gen import gen_circuit_text
from tsim_tpu.external.vec_sim.vec_sampler import VecSampler
from tsim_tpu.stim_core.frame import FrameSampler, reference_sample

CLIFFORD = {
    "S": 1, "H": 2, "SQRT_X": 1, "SQRT_Y": 1, "CNOT": 2, "CZ": 1,
    "X": 1, "Z": 1, "Y": 1,
}


@pytest.mark.parametrize("seed", range(6))
def test_reference_sample_is_possible_outcome(seed):
    text = gen_circuit_text(4, 30, gate_weights=CLIFFORD, seed=seed)
    c = tsim_tpu.Circuit(text)
    ref = reference_sample(c._stim_circ)
    p = VecSampler(c, seed=0).probability_of(ref.astype(int))
    assert p > 1e-9


def test_frame_sampler_matches_statevector_rates():
    text = gen_circuit_text(
        3, 25,
        gate_weights=dict(CLIFFORD, **{"X_ERROR(0.4)": 1, "DEPOLARIZE1(0.4)": 1}),
        seed=42,
    )
    c = tsim_tpu.Circuit(text)
    m1, _, _ = FrameSampler(c, seed=1).sample(20000)
    m2, _, _ = VecSampler(c, seed=2).sample(1500)
    a, b = m1.mean(axis=0), m2.mean(axis=0)
    z = np.abs(a - b) / (np.sqrt(b * (1 - b) / 1500 + a * (1 - a) / 20000) + 1e-9)
    assert z.max() < 4.5, (a, b)


def test_frame_sampler_mid_circuit_and_heralds():
    c = tsim_tpu.Circuit(
        """
        RX 0
        MR 0
        HERALDED_ERASE(0.3) 1
        CX rec[-1] 1
        M 0 1
        DETECTOR rec[-1]
        OBSERVABLE_INCLUDE(0) rec[-2]
        """
    )
    m1, d1, o1 = FrameSampler(c, seed=3).sample(20000)
    m2, d2, o2 = VecSampler(c, seed=4).sample(1500)
    for a, b, n1, n2 in ((m1, m2, 20000, 1500),):
        ra, rb = a.mean(axis=0), b.mean(axis=0)
        z = np.abs(ra - rb) / (np.sqrt(rb * (1 - rb) / n2 + ra * (1 - ra) / n1) + 1e-9)
        assert z.max() < 4.5, (ra, rb)


def test_m2d_converter_roundtrip():
    from tsim_tpu.models.surface_code import rotated_surface_code_memory_z

    c = rotated_surface_code_memory_z(3, 2, after_clifford_depolarization=0.02)
    fs = FrameSampler(c, seed=0)
    m, d, o = fs.sample(500)
    conv = c.compile_m2d_converter()
    dets, obs = conv.convert(measurements=m, separate_observables=True)
    np.testing.assert_array_equal(dets, d)
    np.testing.assert_array_equal(obs, o)
