"""Bell-trick gate verification through the state-probs sampler.

Prepare Bell pairs, apply the instruction, measure everything, and rebuild
|U|^2 from joint outcome probabilities (P(i, x) = |U_ix|^2 / 2^n). Heralded
channels are verified by conditioning on the herald record. Semantic spec:
reference ``test/integration/test_gate_unitaries.py:96-320``; every
expectation matrix below is derived from the P_+ + phase*P_- definition of
SPP/TPP, not transcribed.
"""

import itertools

import numpy as np
import pytest

from tsim_tpu.circuit import Circuit

I2 = np.eye(2)
X = np.array([[0, 1], [1, 0]], dtype=complex)
Y = np.array([[0, -1j], [1j, 0]], dtype=complex)
Z = np.diag([1, -1]).astype(complex)


def _phase_gate(pauli: np.ndarray, phase: complex) -> np.ndarray:
    """P_+ + phase * P_-: multiply the -1 eigenspace of ``pauli`` by phase."""
    n = pauli.shape[0]
    return (1 + phase) / 2 * np.eye(n) + (1 - phase) / 2 * pauli


def _spp(pauli, dagger=False):
    return _phase_gate(pauli, -1j if dagger else 1j)


def _tpp(pauli, dagger=False):
    w = np.exp(1j * np.pi / 4)
    return _phase_gate(pauli, w.conjugate() if dagger else w)


def _bell_matrix(instruction: str, n: int) -> np.ndarray:
    """|U|^2 for an n-qubit instruction via the Bell trick."""
    qubits = " ".join(str(q) for q in range(2 * n))
    halves = " ".join(f"{q} {q + n}" for q in range(n))
    c = Circuit(
        f"R {qubits}\n"
        + "\n".join(f"H {q}" for q in range(n))
        + f"\nCNOT {halves}\n{instruction}\nM {qubits}"
    )
    probs = c.compile_state_probs(seed=0)
    dim = 1 << n
    mat = np.zeros((dim, dim))
    for i, x in itertools.product(range(dim), repeat=2):
        bits = [(i >> (n - 1 - k)) & 1 for k in range(n)]
        bits += [(x >> (n - 1 - k)) & 1 for k in range(n)]
        mat[i, x] = float(probs.probability_of(np.array(bits), batch_size=1)[0])
    return mat * dim


def _heralded_matrix(
    instruction: str, herald_value: int, batch_size: int = 1
) -> np.ndarray:
    """|effect|^2 on one Bell-paired qubit, conditioned on the herald bit.

    ``probability_of`` conditions on the sampled noise configuration; for
    stochastic channels pass a batch and average to marginalize the noise.
    """
    c = Circuit(f"R 0 1\nH 0\nCNOT 0 1\n{instruction} 0\nM 0 1")
    probs = c.compile_state_probs(seed=0)
    mat = np.zeros((2, 2))
    total = 0.0
    for i, x in itertools.product(range(2), repeat=2):
        p = float(
            probs.probability_of(
                np.array([herald_value, i, x]), batch_size=batch_size
            ).mean()
        )
        mat[i, x] = p
        total += p
    assert total > 1e-12, "herald value never occurs"
    return mat / total * 2


SPP_CASES = {
    "SPP Z0": _spp(Z),
    "SPP_DAG Z0": _spp(Z, dagger=True),
    "SPP !Z0": _spp(Z, dagger=True),
    "SPP_DAG !Z0": _spp(Z),
    "SPP X0": _spp(X),
    "SPP !X0": _spp(X, dagger=True),
    "SPP Y0": _spp(Y),
    "SPP_DAG Y0": _spp(Y, dagger=True),
    "SPP X0*X0": I2,
    "SPP_DAG Y0*Y0": I2,
    # Z X Z = -X: algebra sign flips the dagger
    "SPP Z0*X0*Z0": _spp(X, dagger=True),
    "SPP_DAG Z0*X0*Z0": _spp(X),
}

TPP_CASES = {
    "TPP Z0": _tpp(Z),
    "TPP_DAG Z0": _tpp(Z, dagger=True),
    "TPP !Z0": _tpp(Z, dagger=True),
    "TPP_DAG !Z0": _tpp(Z),
    "TPP X0": _tpp(X),
    "TPP !X0": _tpp(X, dagger=True),
    "TPP Y0": _tpp(Y),
    "TPP_DAG Y0": _tpp(Y, dagger=True),
    "TPP X0*X0": I2,
    "TPP Z0*X0*Z0": _tpp(X, dagger=True),
}

SPP2_CASES = {
    "SPP X0*X1": _spp(np.kron(X, X)),
    "SPP_DAG X0*X1": _spp(np.kron(X, X), dagger=True),
    "SPP !Z0*Z1": _spp(np.kron(Z, Z), dagger=True),
    "SPP Y0*Y1": _spp(np.kron(Y, Y)),
    "SPP X0*X1*X0*X1": np.eye(4),
    # -X0 X1 from Z0 X0 Z0
    "SPP Z0*X0*Z0*X1": _spp(np.kron(X, X), dagger=True),
}

TPP2_CASES = {
    "TPP Z0*Z1": _tpp(np.kron(Z, Z)),
    "TPP_DAG Z0*Z1": _tpp(np.kron(Z, Z), dagger=True),
    "TPP !X0*X1": _tpp(np.kron(X, X), dagger=True),
    "TPP Y0*Y1": _tpp(np.kron(Y, Y)),
    "TPP Z0*X0*Z0*X1": _tpp(np.kron(X, X), dagger=True),
}


@pytest.mark.parametrize("instruction", sorted(SPP_CASES))
def test_spp_single_qubit_bell(instruction):
    assert _bell_matrix(instruction, 1) == pytest.approx(
        np.abs(SPP_CASES[instruction]) ** 2, abs=1e-7
    )


@pytest.mark.parametrize("instruction", sorted(TPP_CASES))
def test_tpp_single_qubit_bell(instruction):
    assert _bell_matrix(instruction, 1) == pytest.approx(
        np.abs(TPP_CASES[instruction]) ** 2, abs=1e-7
    )


@pytest.mark.parametrize("instruction", sorted(SPP2_CASES))
def test_spp_two_qubit_bell(instruction):
    assert _bell_matrix(instruction, 2) == pytest.approx(
        np.abs(SPP2_CASES[instruction]) ** 2, abs=1e-7
    )


@pytest.mark.parametrize("instruction", sorted(TPP2_CASES))
def test_tpp_two_qubit_bell(instruction):
    assert _bell_matrix(instruction, 2) == pytest.approx(
        np.abs(TPP2_CASES[instruction]) ** 2, abs=1e-7
    )


HERALDED_PAULI_CASES = {
    "I": ("HERALDED_PAULI_CHANNEL_1(1, 0, 0, 0)", I2),
    "X": ("HERALDED_PAULI_CHANNEL_1(0, 1, 0, 0)", X),
    "Y": ("HERALDED_PAULI_CHANNEL_1(0, 0, 1, 0)", Y),
    "Z": ("HERALDED_PAULI_CHANNEL_1(0, 0, 0, 1)", Z),
}


@pytest.mark.parametrize("pauli", sorted(HERALDED_PAULI_CASES))
def test_heralded_pauli_applies_conditioned_on_herald(pauli):
    instruction, unitary = HERALDED_PAULI_CASES[pauli]
    mat = _heralded_matrix(instruction, herald_value=1)
    assert mat == pytest.approx(np.abs(unitary) ** 2, abs=1e-7)


def test_heralded_channel_no_fire_is_identity():
    mat = _heralded_matrix("HERALDED_PAULI_CHANNEL_1(0, 0, 0, 0)", herald_value=0)
    assert mat == pytest.approx(np.eye(2), abs=1e-7)


def test_heralded_partial_fire_identity_branch():
    # p=0.5 herald-only: herald=1 branch must still act as identity.
    mat = _heralded_matrix(
        "HERALDED_PAULI_CHANNEL_1(0.5, 0, 0, 0)", herald_value=1, batch_size=4096
    )
    assert mat == pytest.approx(np.eye(2), abs=0.05)


def test_heralded_erase_conditioned_is_maximally_mixed():
    # Erasure: conditioned on the herald, the qubit is depolarized; every
    # input column becomes the uniform distribution.
    mat = _heralded_matrix("HERALDED_ERASE(0.5)", herald_value=1, batch_size=8192)
    assert mat == pytest.approx(np.full((2, 2), 0.5), abs=0.05)


def test_heralded_erase_no_fire_preserves_state():
    mat = _heralded_matrix("HERALDED_ERASE(0.25)", herald_value=0, batch_size=4096)
    assert mat == pytest.approx(np.eye(2), abs=0.05)
