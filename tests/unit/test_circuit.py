"""Circuit API tests: shorthand, append rewrites, dunders, inverse, queries."""

import numpy as np
import pytest

import tsim_tpu
from tsim_tpu import Circuit


def test_shorthand_constructor():
    c = Circuit("T 0\nTPP X0*X1\nR_Z(0.3) 0\nU3(0.3, 0.24, 0.49) 1\nR_XX(0.5) 0 1")
    text = str(c._stim_circ)
    assert "S[T] 0" in text
    assert "SPP[T] X0*X1" in text
    assert "I[R_Z(theta=0.3*pi)] 0" in text
    assert "I[U3(theta=0.3*pi, phi=0.24*pi, lambda=0.49*pi)] 1" in text
    assert "SPP[R_PAULI(theta=0.5*pi)] X0*X1" in text


def test_str_roundtrip():
    c = Circuit("T 0\nTPP X0*Y1\nR_Z(0.3) 0\nM 0 1")
    assert Circuit(str(c)) == c
    assert "T 0" in str(c)
    assert "TPP X0*Y1" in str(c)
    assert "R_Z(0.3)" in str(c)


def test_ccz_expansion():
    c = Circuit("CCZ 0 1 2")
    text = str(c._stim_circ)
    assert "S[T]" in text and "S_DAG[T]" in text and "CNOT" in text
    assert c.tcount() == 7
    ccx = Circuit("CCX 0 1 2")
    assert str(ccx._stim_circ).count("H 2") == 2


def test_append_api():
    c = Circuit()
    c.append("T", [0])
    c.append("R_Z", [0], 0.3)
    c.append("U3", [1], (0.3, 0.24, 0.49))
    c.append("R_XX", [0, 1], 0.5)
    c.append("TPP", [tsim_tpu.stim_core.target_x(0)])
    c.append("M", [0, 1])
    assert c.num_measurements == 2
    with pytest.raises(ValueError):
        c.append("R_Z", [0])
    with pytest.raises(ValueError):
        c.append("R_XX", [0, 0], 0.5)
    with pytest.raises(ValueError):
        c.append("U3", [0], (0.3,))


def test_dunders():
    c = Circuit("H 0\nM 0")
    assert len(c) == 2
    c2 = c + c
    assert c2.num_measurements == 2
    c3 = c * 3
    assert c3.num_measurements == 3
    assert (2 * c).num_measurements == 2
    assert c[0:1] == Circuit("H 0")
    cc = c.copy()
    cc += c
    assert cc.num_measurements == 2 and c.num_measurements == 1


def test_counters():
    c = Circuit(
        "R 0 1 2\nH 0\nM 0 1\nTICK\nREPEAT 3 {\nM 2\nTICK\n}\n"
        "DETECTOR rec[-1]\nOBSERVABLE_INCLUDE(2) rec[-1]"
    )
    assert c.num_qubits == 3
    assert c.num_measurements == 5
    assert c.num_detectors == 1
    assert c.num_observables == 3
    assert c.num_ticks == 4


def test_is_clifford():
    assert Circuit("H 0\nS 0\nCZ 0 1\nR_Z(0.5) 0").is_clifford
    assert not Circuit("T 0").is_clifford
    assert not Circuit("R_Z(0.3) 0").is_clifford
    assert not Circuit("TPP X0*X1").is_clifford
    assert Circuit("R_PAULI(1.5) X0*X1").is_clifford


def test_stim_circuit_expansion():
    c = Circuit("R_Z(0.5) 0\nR_X(1) 1\nR_PAULI(0.5) X0*X1")
    expanded = c.stim_circuit
    text = str(expanded)
    assert "S 0" in text
    assert "X 1" in text
    assert "SPP X0*X1" in text


def test_inverse():
    c = Circuit("H 0\nT 0\nR_Z(0.3) 0\nU3(0.3, 0.2, 0.1) 0")
    inv = c.inverse()
    text = str(inv)
    assert "T_DAG 0" in text
    assert "R_Z(-0.3)" in text
    assert "U3(-0.3, -0.1, -0.2)" in text
    # unitary check: U * U^-1 == I
    m = np.asarray((c + inv).to_matrix())
    np.testing.assert_allclose(m, np.eye(2), atol=1e-9)


def test_to_matrix_tensor():
    c = Circuit("H 0")
    m = np.asarray(c.to_matrix())
    np.testing.assert_allclose(m, np.array([[1, 1], [1, -1]]) / np.sqrt(2), atol=1e-9)
    c2 = Circuit("T 0")
    np.testing.assert_allclose(
        np.asarray(c2.to_matrix()),
        np.diag([1, np.exp(1j * np.pi / 4)]),
        atol=1e-9,
    )


def test_tcount():
    assert Circuit("T 0\nT_DAG 1\nTPP X0*X1\nS 0").tcount() == 3


def test_without_noise_annotations():
    c = Circuit("H 0\nX_ERROR(0.1) 0\nM 0\nDETECTOR rec[-1]\nOBSERVABLE_INCLUDE(0) rec[-1]")
    wn = c.without_noise()
    assert "X_ERROR" not in str(wn)
    wa = c.without_annotations()
    assert wa.num_detectors == 0 and wa.num_observables == 0


def test_approx_equals():
    a = Circuit("X_ERROR(0.100) 0")
    b = Circuit("X_ERROR(0.099) 0")
    assert a.approx_equals(b, atol=0.01)
    assert not a.approx_equals(b, atol=1e-5)


def test_from_file(tmp_path):
    path = tmp_path / "c.stim"
    path.write_text("H 0\nT 0\nM 0\n")
    c = Circuit.from_file(str(path))
    assert c.num_measurements == 1
    assert c.tcount() == 1


def test_enriched_parse_error():
    with pytest.raises(ValueError, match="R_Z"):
        Circuit("R_Z 0")  # missing angle parens
