"""Parser edge cases: tags, Pauli algebra, targets, errors.

Mirrors the reference's parse test matrix (reference
``test/unit/core/test_parse.py``, SURVEY.md section 4).
"""

from fractions import Fraction

import pytest

import tsim_tpu
from tsim_tpu.core.parse import (
    R_PAULI_MAX_QUBITS,
    _iter_pauli_products,
    parse_parametric_tag,
    parse_stim_circuit,
)
from tsim_tpu.stim_core import Circuit as StimCircuit


def _instr(text):
    return StimCircuit(text)[0]


# ----------------------------------------------------------- parametric tags
class TestParametricTag:
    def test_rz_tag(self):
        gate, params = parse_parametric_tag(_instr("I[R_Z(theta=0.3*pi)] 0"))
        assert gate == "R_Z"
        # Non-dyadic angles canonicalize to the nearest 2^-40 dyadic
        # (exact Fraction arithmetic downstream stays int64-bounded).
        theta = params["theta"]
        assert abs(theta - Fraction(3, 10)) <= Fraction(1, 2**40)
        assert theta.denominator & (theta.denominator - 1) == 0

    def test_u3_tag_all_params(self):
        gate, params = parse_parametric_tag(
            _instr("I[U3(theta=0.5*pi, phi=-0.25*pi, lambda=1.5*pi)] 0")
        )
        assert gate == "U3"
        assert params == {
            "theta": Fraction(1, 2),
            "phi": Fraction(-1, 4),
            "lambda": Fraction(3, 2),
        }

    def test_scientific_notation(self):
        _, params = parse_parametric_tag(_instr("I[R_X(theta=1e-3*pi)] 0"))
        assert abs(params["theta"] - Fraction("0.001")) <= Fraction(1, 2**40)

    def test_negative_angle(self):
        _, params = parse_parametric_tag(_instr("I[R_Y(theta=-.75*pi)] 0"))
        assert params["theta"] == Fraction(-3, 4)

    def test_non_tag_returns_none(self):
        assert parse_parametric_tag(_instr("I[hello] 0")) is None
        assert parse_parametric_tag(_instr("I 0")) is None

    def test_unknown_gate_raises(self):
        with pytest.raises(ValueError, match="Unknown parametric gate"):
            parse_parametric_tag(_instr("I[R_W(theta=0.5*pi)] 0"))

    def test_missing_param_raises(self):
        with pytest.raises(ValueError, match="expected"):
            parse_parametric_tag(_instr("I[U3(theta=0.5*pi)] 0"))

    def test_extra_param_raises(self):
        with pytest.raises(ValueError, match="expected"):
            parse_parametric_tag(_instr("I[R_Z(theta=0.5*pi, phi=0.5*pi)] 0"))

    def test_malformed_value_raises(self):
        with pytest.raises(ValueError, match="Malformed"):
            parse_parametric_tag(_instr("I[R_Z(theta=abc*pi)] 0"))

    def test_missing_pi_suffix_raises(self):
        with pytest.raises(ValueError, match="Malformed"):
            parse_parametric_tag(_instr("I[R_Z(theta=0.5)] 0"))


# --------------------------------------------------------- Pauli product iter
def _products(text):
    return list(_iter_pauli_products(_instr(text)))


class TestPauliProducts:
    def test_single_product(self):
        [(paulis, invert)] = _products("MPP X0*Y1*Z2")
        assert paulis == [("X", 0), ("Y", 1), ("Z", 2)]
        assert not invert

    def test_multiple_products(self):
        prods = _products("MPP X0*X1 Z2*Z3")
        assert [p for p, _ in prods] == [
            [("X", 0), ("X", 1)],
            [("Z", 2), ("Z", 3)],
        ]

    def test_inverted_target_sets_invert(self):
        [(_, invert)] = _products("MPP !X0*X1")
        assert invert

    def test_double_inversion_cancels(self):
        [(_, invert)] = _products("MPP !X0*!X1")
        assert not invert

    def test_same_pauli_twice_cancels(self):
        [(paulis, invert)] = _products("MPP X0*X0*Z1")
        assert paulis == [("Z", 1)]
        assert not invert

    def test_xy_gives_minus_z_pair(self):
        # X*Y = iZ; a single repeat is anti-Hermitian.
        with pytest.raises(ValueError, match="anti-Hermitian"):
            _products("MPP X0*Y0")

    def test_xy_yx_sign(self):
        # (X0 Y0)(Y1 X1) = (iZ0)(-iZ1) = Z0 Z1, Hermitian, no inversion.
        [(paulis, invert)] = _products("MPP X0*Y0*Y1*X1")
        assert paulis == [("Z", 0), ("Z", 1)]
        assert not invert

    def test_xy_xy_gives_inverted(self):
        # (X0 Y0)(X1 Y1) = (iZ0)(iZ1) = -Z0 Z1.
        [(paulis, invert)] = _products("MPP X0*Y0*X1*Y1")
        assert paulis == [("Z", 0), ("Z", 1)]
        assert invert

    def test_sorted_by_qubit(self):
        [(paulis, _)] = _products("MPP Z5*X1*Y3")
        assert paulis == [("X", 1), ("Y", 3), ("Z", 5)]


# --------------------------------------------------------------- full parser
class TestParseStimCircuit:
    def test_sweep_bits_raise(self):
        c = tsim_tpu.Circuit("CX sweep[0] 0\nM 0")
        with pytest.raises(NotImplementedError, match="[Ss]weep"):
            parse_stim_circuit(c.cast_to_stim())

    def test_shift_coords_skipped(self):
        c = tsim_tpu.Circuit("SHIFT_COORDS(1, 2)\nH 0\nM 0")
        b = parse_stim_circuit(c.cast_to_stim())
        assert len(b.rec) == 1

    def test_observable_pauli_targets_raise(self):
        # Rejected at circuit construction (stim_core gate data).
        from tsim_tpu import stim_core

        sc = StimCircuit("H 0\nM 0")
        with pytest.raises(ValueError, match="[Pp]auli"):
            sc.append("OBSERVABLE_INCLUDE", [stim_core.target_x(0)], 0)

    def test_unknown_gate_raises(self):
        with pytest.raises(ValueError):
            tsim_tpu.Circuit("FOOBAR 0")

    def test_missing_observables_materialized(self):
        c = tsim_tpu.Circuit("M 0\nOBSERVABLE_INCLUDE(2) rec[-1]")
        b = parse_stim_circuit(c.cast_to_stim())
        # Observables 0 and 1 are materialized as deterministic-zero spiders.
        assert sorted(b.observables_dict) == [0, 1, 2]

    def test_t_tag_dispatch(self):
        c = tsim_tpu.Circuit("")
        c.append("T", [0])
        c.append("T_DAG", [0])
        b = parse_stim_circuit(c.cast_to_stim())
        from tsim_tpu.zx.decompose import tcount

        assert tcount(b.graph) == 2

    def test_r_pauli_too_many_qubits(self):
        n = R_PAULI_MAX_QUBITS + 1
        prod = "*".join(f"X{q}" for q in range(n))
        c = tsim_tpu.Circuit(f"SPP[R_PAULI(theta=0.3*pi)] {prod}")
        with pytest.raises(ValueError, match="at most"):
            parse_stim_circuit(c.cast_to_stim())

    def test_r_pauli_repeated_qubit_raises(self):
        c = tsim_tpu.Circuit("SPP[R_PAULI(theta=0.3*pi)] X0*Z0")
        with pytest.raises(ValueError, match="distinct"):
            parse_stim_circuit(c.cast_to_stim())

    def test_correlated_error_chain_bits(self):
        c = tsim_tpu.Circuit(
            "E(0.1) X0\nELSE_CORRELATED_ERROR(0.2) Y1\n"
            "ELSE_CORRELATED_ERROR(0.3) Z0 Z1\nM 0 1"
        )
        b = parse_stim_circuit(c.cast_to_stim())
        # One chain of 3 alternatives: one channel with 2^3 outcomes.
        assert len(b.channel_probs) == 1
        assert len(b.channel_probs[0]) == 8

    def test_separate_e_instructions_two_channels(self):
        c = tsim_tpu.Circuit("E(0.1) X0\nE(0.2) Z0\nM 0")
        b = parse_stim_circuit(c.cast_to_stim())
        assert len(b.channel_probs) == 2

    def test_classically_controlled_gate(self):
        c = tsim_tpu.Circuit("M 0\nCX rec[-1] 1\nM 1")
        b = parse_stim_circuit(c.cast_to_stim())
        assert len(b.rec) == 2

    def test_repeat_blocks_flattened(self):
        c = tsim_tpu.Circuit("REPEAT 3 {\n H 0\n M 0\n}")
        b = parse_stim_circuit(c.cast_to_stim())
        assert len(b.rec) == 3

    def test_heralded_channels_add_records(self):
        c = tsim_tpu.Circuit("HERALDED_ERASE(0.1) 0\nM 0")
        b = parse_stim_circuit(c.cast_to_stim())
        assert len(b.rec) == 2  # herald + measurement
