"""Gate builders produce exactly the intended unitaries (incl. global phase).

Matrices are constructed from first principles (projector/rotation
definitions matching Stim's documented conventions). Single-qubit axis
permutation gates additionally verify their Pauli conjugation action.
"""

import itertools
from fractions import Fraction

import numpy as np
import pytest

from tsim_tpu.core import instructions as ins
from tsim_tpu.zx.graph import BOUNDARY

I2 = np.eye(2)
PX = np.array([[0, 1], [1, 0]], dtype=complex)
PY = np.array([[0, -1j], [1j, 0]], dtype=complex)
PZ = np.array([[1, 0], [0, -1]], dtype=complex)
H = (PX + PZ) / np.sqrt(2)
S = np.diag([1, 1j])
PAULI = {"I": I2, "X": PX, "Y": PY, "Z": PZ}


def kron(*ms):
    out = np.array([[1.0 + 0j]])
    for m in ms:
        out = np.kron(out, m)
    return out


def pauli_product(paulis, nq):
    ops = [I2] * nq
    for p, q in paulis:
        ops[q] = PAULI[p]
    return kron(*ops)


def phase_eigenspace(P, factor):
    """P_+ + factor * P_- for a Pauli product P."""
    plus = (np.eye(P.shape[0]) + P) / 2
    minus = (np.eye(P.shape[0]) - P) / 2
    return plus + factor * minus


def builder_matrix(fn, nq, *args, **kwargs):
    b = ins.GraphRepresentation()
    for q in range(nq):
        ins.ensure_lane(b, q)
    fn(b, *args, **kwargs)
    g = b.graph
    inputs = [b.first_vertex[q] for q in range(nq)]
    outputs = [b.last_vertex[q] for q in range(nq)]
    g.set_inputs(inputs)
    g.set_outputs(outputs)
    return np.asarray(g.to_matrix())


SQRT_X = phase_eigenspace(PX, 1j)
SQRT_Y = phase_eigenspace(PY, 1j)

SINGLE_QUBIT_MATRICES = {
    "x": PX,
    "y": PY,
    "z": PZ,
    "s": S,
    "s_dag": S.conj().T,
    "t": np.diag([1, np.exp(1j * np.pi / 4)]),
    "t_dag": np.diag([1, np.exp(-1j * np.pi / 4)]),
    "sqrt_x": SQRT_X,
    "sqrt_x_dag": SQRT_X.conj().T,
    "sqrt_y": SQRT_Y,
    "sqrt_y_dag": SQRT_Y.conj().T,
    "h": H,
    "h_xy": (PX + PY) / np.sqrt(2),
    "h_yz": (PY + PZ) / np.sqrt(2),
    "h_nxy": (PX - PY) / np.sqrt(2),
    "h_nxz": (PZ - PX) / np.sqrt(2),
    "h_nyz": (PZ - PY) / np.sqrt(2),
}


@pytest.mark.parametrize("name", sorted(SINGLE_QUBIT_MATRICES))
def test_single_qubit_gates(name):
    got = builder_matrix(getattr(ins, name), 1, 0)
    np.testing.assert_allclose(got, SINGLE_QUBIT_MATRICES[name], atol=1e-9)


CXYZ_ACTIONS = {
    # name -> mapping of each Pauli under conjugation: P -> (sign, P')
    "c_xyz": {"X": (1, "Y"), "Y": (1, "Z"), "Z": (1, "X")},
    "c_zyx": {"X": (1, "Z"), "Z": (1, "Y"), "Y": (1, "X")},
    "c_nxyz": {"X": (-1, "Y"), "Y": (1, "Z"), "Z": (-1, "X")},
    "c_xnyz": {"X": (-1, "Y"), "Y": (-1, "Z"), "Z": (1, "X")},
    "c_xynz": {"X": (1, "Y"), "Y": (-1, "Z"), "Z": (-1, "X")},
    "c_nzyx": {"Z": (-1, "Y"), "Y": (1, "X"), "X": (-1, "Z")},
    "c_znyx": {"Z": (-1, "Y"), "Y": (-1, "X"), "X": (1, "Z")},
    "c_zynx": {"Z": (1, "Y"), "Y": (-1, "X"), "X": (-1, "Z")},
}


@pytest.mark.parametrize("name", sorted(CXYZ_ACTIONS))
def test_axis_cycling_gates_unitary_action(name):
    U = builder_matrix(getattr(ins, name), 1, 0)
    np.testing.assert_allclose(U @ U.conj().T, I2, atol=1e-9)
    # global phase convention: U = (I - i(sx X + sy Y + sz Z)) / 2
    np.testing.assert_allclose(np.trace(U), 1, atol=1e-9)
    for p, (sign, p2) in CXYZ_ACTIONS[name].items():
        np.testing.assert_allclose(
            U @ PAULI[p] @ U.conj().T, sign * PAULI[p2], atol=1e-9
        )


def test_inverse_pairs():
    for a, bname in [
        ("c_xyz", "c_zyx"),
        ("c_nxyz", "c_zynx"),
        ("c_xnyz", "c_znyx"),
        ("c_xynz", "c_nzyx"),
    ]:
        Ua = builder_matrix(getattr(ins, a), 1, 0)
        Ub = builder_matrix(getattr(ins, bname), 1, 0)
        np.testing.assert_allclose(Ua @ Ub, I2, atol=1e-9)


CX = kron((I2 + PZ) / 2, I2) + kron((I2 - PZ) / 2, PX)
CY = kron((I2 + PZ) / 2, I2) + kron((I2 - PZ) / 2, PY)
CZ = kron((I2 + PZ) / 2, I2) + kron((I2 - PZ) / 2, PZ)
SWAP = np.array(
    [[1, 0, 0, 0], [0, 0, 1, 0], [0, 1, 0, 0], [0, 0, 0, 1]], dtype=complex
)

TWO_QUBIT_MATRICES = {
    "cnot": CX,
    "cy": CY,
    "cz": CZ,
    "swap": SWAP,
    "cxswap": SWAP @ CX,
    "czswap": SWAP @ CZ,
    "swapcx": CX @ SWAP,
    "swapcz": CZ @ SWAP,
    "iswap": SWAP @ phase_eigenspace(kron(PZ, PZ), 1j),
    "iswap_dag": SWAP @ phase_eigenspace(kron(PZ, PZ), -1j),
    "sqrt_xx": phase_eigenspace(kron(PX, PX), 1j),
    "sqrt_xx_dag": phase_eigenspace(kron(PX, PX), -1j),
    "sqrt_yy": phase_eigenspace(kron(PY, PY), 1j),
    "sqrt_yy_dag": phase_eigenspace(kron(PY, PY), -1j),
    "sqrt_zz": phase_eigenspace(kron(PZ, PZ), 1j),
    "sqrt_zz_dag": phase_eigenspace(kron(PZ, PZ), -1j),
    "xcx": kron((I2 + PX) / 2, I2) + kron((I2 - PX) / 2, PX),
    "xcy": kron((I2 + PX) / 2, I2) + kron((I2 - PX) / 2, PY),
    "xcz": kron((I2 + PX) / 2, I2) + kron((I2 - PX) / 2, PZ),
    "ycx": kron((I2 + PY) / 2, I2) + kron((I2 - PY) / 2, PX),
    "ycy": kron((I2 + PY) / 2, I2) + kron((I2 - PY) / 2, PY),
    "ycz": kron((I2 + PY) / 2, I2) + kron((I2 - PY) / 2, PZ),
}


@pytest.mark.parametrize("name", sorted(TWO_QUBIT_MATRICES))
def test_two_qubit_gates(name):
    got = builder_matrix(getattr(ins, name), 2, 0, 1)
    np.testing.assert_allclose(got, TWO_QUBIT_MATRICES[name], atol=1e-9)


def rz(theta_pi):
    return np.array(
        [
            [np.exp(-1j * np.pi * theta_pi / 2), 0],
            [0, np.exp(1j * np.pi * theta_pi / 2)],
        ]
    )


def ry(theta_pi):
    a = np.pi * theta_pi / 2
    return np.array([[np.cos(a), -np.sin(a)], [np.sin(a), np.cos(a)]])


def rx(theta_pi):
    a = np.pi * theta_pi / 2
    return np.array([[np.cos(a), -1j * np.sin(a)], [-1j * np.sin(a), np.cos(a)]])


@pytest.mark.parametrize("theta", [Fraction(3, 10), Fraction(1, 4), Fraction(-7, 5)])
def test_rotations(theta):
    tp = float(theta)
    np.testing.assert_allclose(builder_matrix(ins.r_z, 1, 0, theta), rz(tp), atol=1e-9)
    np.testing.assert_allclose(builder_matrix(ins.r_x, 1, 0, theta), rx(tp), atol=1e-9)
    np.testing.assert_allclose(builder_matrix(ins.r_y, 1, 0, theta), ry(tp), atol=1e-9)


def test_u3():
    th, ph, lm = Fraction(3, 10), Fraction(1, 5), Fraction(-2, 7)
    got = builder_matrix(ins.u3, 1, 0, th, ph, lm)
    t, p, l = np.pi * float(th), np.pi * float(ph), np.pi * float(lm)
    want = np.array(
        [
            [np.cos(t / 2), -np.exp(1j * l) * np.sin(t / 2)],
            [np.exp(1j * p) * np.sin(t / 2), np.exp(1j * (p + l)) * np.cos(t / 2)],
        ]
    )
    np.testing.assert_allclose(got, want, atol=1e-9)


@pytest.mark.parametrize(
    "paulis",
    [
        [("Z", 0)],
        [("X", 0)],
        [("Y", 0)],
        [("X", 0), ("X", 1)],
        [("X", 0), ("Y", 1), ("Z", 2)],
        [("Z", 0), ("Z", 2)],
    ],
)
def test_spp_tpp_rpauli(paulis):
    nq = max(q for _, q in paulis) + 1
    P = pauli_product(paulis, nq)
    got = builder_matrix(ins.spp, nq, paulis)
    np.testing.assert_allclose(got, phase_eigenspace(P, 1j), atol=1e-9)
    got = builder_matrix(ins.spp, nq, paulis, dagger=True)
    np.testing.assert_allclose(got, phase_eigenspace(P, -1j), atol=1e-9)
    got = builder_matrix(ins.tpp, nq, paulis)
    np.testing.assert_allclose(
        got, phase_eigenspace(P, np.exp(1j * np.pi / 4)), atol=1e-9
    )
    theta = Fraction(3, 10)
    got = builder_matrix(ins.r_pauli, nq, paulis, theta)
    from scipy.linalg import expm

    want = expm(-1j * float(theta) * np.pi / 2 * P)
    np.testing.assert_allclose(got, want, atol=1e-9)
