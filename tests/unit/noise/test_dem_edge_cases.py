"""DEM edge cases: MPP/MPAD/heralds/non-deterministic observables/gauge.

Mirrors the reference's DEM conversion matrix (reference
``test/unit/noise/test_dem.py``).
"""

import numpy as np
import pytest

import tsim_tpu
from tsim_tpu.circuit import Circuit


def _error_rates(dem, kind="D", num=None):
    num = num if num is not None else dem.num_detectors
    rates = np.zeros(num)
    for ins in dem:
        if ins.type == "error":
            p = ins.args[0]
            for t in ins.targets:
                if t.kind == kind:
                    rates[t.val] = rates[t.val] + p - 2 * rates[t.val] * p
    return rates


class TestBasics:
    def test_single_x_error(self):
        c = Circuit("X_ERROR(0.25) 0\nM 0\nDETECTOR rec[-1]")
        dem = c.detector_error_model()
        np.testing.assert_allclose(_error_rates(dem), [0.25])

    def test_depolarize_rates(self):
        c = Circuit("DEPOLARIZE1(0.3) 0\nM 0\nDETECTOR rec[-1]")
        dem = c.detector_error_model()
        # X and Y components flip an M measurement: 2/3 of 0.3.
        np.testing.assert_allclose(_error_rates(dem), [0.2], atol=1e-9)

    def test_correlated_error_chain(self):
        c = Circuit(
            "CORRELATED_ERROR(0.125) X0\nELSE_CORRELATED_ERROR(0.25) X1\n"
            "M 0 1\nDETECTOR rec[-2]\nDETECTOR rec[-1]"
        )
        dem = c.detector_error_model(approximate_disjoint_errors=True)
        rates = _error_rates(dem)
        np.testing.assert_allclose(rates[0], 0.125, atol=1e-9)
        # approximate_disjoint_errors emits the else-branch case probability
        # directly as an independent error (stim semantics), not the
        # conditional-scaled 0.875*0.25.
        np.testing.assert_allclose(rates[1], 0.25, atol=1e-9)

    def test_noiseless_dem_empty_errors(self):
        c = Circuit("H 0\nCNOT 0 1\nM 0 1\nDETECTOR rec[-1] rec[-2]")
        dem = c.detector_error_model()
        assert all(ins.type != "error" for ins in dem)


class TestMeasurementFamilies:
    def test_mpp_detector(self):
        c = Circuit("MPP(0.2) X0*X1\nMPP X0*X1\nDETECTOR rec[-1] rec[-2]")
        dem = c.detector_error_model()
        np.testing.assert_allclose(_error_rates(dem), [0.2])

    def test_mpad_padding(self):
        c = Circuit("X_ERROR(0.25) 0\nMPAD 0\nM 0\nDETECTOR rec[-1] rec[-2]")
        dem = c.detector_error_model()
        # MPAD contributes a constant-0 record bit: detector rate = M's.
        np.testing.assert_allclose(_error_rates(dem), [0.25])

    def test_noisy_mzz(self):
        c = Circuit("R 0 1\nMZZ(0.125) 0 1\nMZZ 0 1\nDETECTOR rec[-1] rec[-2]")
        dem = c.detector_error_model()
        np.testing.assert_allclose(_error_rates(dem), [0.125])


class TestHeralds:
    def test_heralded_erase_herald_detector(self):
        c = Circuit(
            "R 0\nHERALDED_ERASE(0.2) 0\nDETECTOR rec[-1]\nM 0\nDETECTOR rec[-1]"
        )
        dem = c.detector_error_model(approximate_disjoint_errors=True)
        rates = _error_rates(dem)
        # The four disjoint quarters (I/X/Y/Z at 0.05 each) are emitted as
        # independent errors, so the XOR-combined herald rate is
        # (1 - 0.9^4)/2, not the exact marginal 0.2 (stim approximation).
        np.testing.assert_allclose(rates[0], (1 - 0.9**4) / 2, atol=1e-9)
        # Z/Y halves flip M: two independent 0.05 errors.
        np.testing.assert_allclose(rates[1], (1 - 0.9**2) / 2, atol=1e-9)

    def test_heralded_pauli_channel(self):
        c = Circuit(
            "R 0\nHERALDED_PAULI_CHANNEL_1(0.05, 0.1, 0.0, 0.05) 0\n"
            "DETECTOR rec[-1]\nM 0\nDETECTOR rec[-1]"
        )
        dem = c.detector_error_model(approximate_disjoint_errors=True)
        rates = _error_rates(dem)
        # Independent-emission approximation: herald rate combines the four
        # case probabilities 0.05/0.1/0/0.05 via XOR algebra.
        herald = (1 - 0.9 * 0.8 * 1.0 * 0.9) / 2
        np.testing.assert_allclose(rates[0], herald, atol=1e-9)
        # X (0.1) and Y (0) flip M.
        np.testing.assert_allclose(rates[1], (1 - 0.8) / 2, atol=1e-9)


class TestObservables:
    def test_observable_error(self):
        c = Circuit("X_ERROR(0.125) 0\nM 0\nOBSERVABLE_INCLUDE(0) rec[-1]")
        dem = c.detector_error_model()
        rates = _error_rates(dem, kind="L", num=dem.num_observables)
        np.testing.assert_allclose(rates, [0.125])

    def test_non_deterministic_observable_allowed(self):
        # |+> measured in Z: the observable is a coin flip. The reference
        # extends stim's DEM to allow this (gauge observables dropped).
        c = Circuit("H 0\nM 0\nOBSERVABLE_INCLUDE(0) rec[-1]")
        dem = c.detector_error_model()
        assert dem.num_observables == 1
        # no error statement should target L0 at rate 0.5
        for ins in dem:
            if ins.type == "error":
                assert not any(t.kind == "L" for t in ins.targets)

    def test_observable_count_preserved(self):
        c = Circuit(
            "X_ERROR(0.1) 0\nM 0 0\nOBSERVABLE_INCLUDE(2) rec[-1]\n"
            "DETECTOR rec[-1] rec[-2]"
        )
        dem = c.detector_error_model()
        assert dem.num_observables == 3

    def test_decompose_errors_rejected_with_gauge(self):
        c = Circuit("H 0\nM 0\nOBSERVABLE_INCLUDE(0) rec[-1]")
        with pytest.raises(Exception):
            c.detector_error_model(decompose_errors=True)


class TestGauge:
    def test_gauge_detector_allowed(self):
        # Detector on a 50/50 measurement: gauge. The extended DEM keeps it.
        c = Circuit("H 0\nM 0\nDETECTOR rec[-1]")
        dem = c.detector_error_model()
        assert dem.num_detectors == 1
        # gauge detectors surface as error(0.5) D0
        gauge = [
            ins
            for ins in dem
            if ins.type == "error" and abs(ins.args[0] - 0.5) < 1e-12
        ]
        assert len(gauge) == 1
