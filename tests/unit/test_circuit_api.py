"""Circuit API surface: edge cases beyond tests/unit/test_circuit.py.

Mirrors the breadth of the reference's circuit test matrix (reference
``test/unit/test_circuit.py``, 123 tests): slicing/copy semantics, gate
append validation, m2d conversion, unitary equivalence of shorthand vs
append, REPEAT handling, and inverse round-trips.
"""

import numpy as np
import pytest

from tsim_tpu.circuit import Circuit


class TestConstructionAndText:
    def test_empty(self):
        c = Circuit()
        assert len(c) == 0
        assert c.num_qubits == 0

    def test_repr_contains_program(self):
        c = Circuit("H 0")
        assert "H 0" in repr(c)

    def test_parse_error_mentions_line(self):
        with pytest.raises(ValueError):
            Circuit("NOT_A_GATE 0")

    def test_tpp_roundtrip(self):
        c = Circuit("TPP X0*Z1")
        assert "TPP X0*Z1" in str(c)

    def test_rotation_roundtrip(self):
        c = Circuit("R_Z(0.25) 0\nR_XX(0.5) 0 1")
        s = str(c)
        assert "R_Z(0.25) 0" in s
        assert "R_XX(0.5) 0 1" in s

    def test_u3_roundtrip(self):
        c = Circuit("U3(0.1, 0.2, 0.3) 0")
        assert "U3(0.1, 0.2, 0.3) 0" in str(c)

    def test_comment_preserved_through_ccz(self):
        text = "# prep\nCCZ 0 1 2"
        c = Circuit(text)
        assert c.tcount() == 7  # CCZ = 7 T gates

    def test_blank_lines_ok(self):
        c = Circuit("\n\nH 0\n\nM 0\n")
        assert c.num_measurements == 1


class TestSlicingAndArithmetic:
    def test_getitem_int(self):
        c = Circuit("H 0\nCNOT 0 1\nM 0")
        instr = c[1]
        assert instr.name in ("CX", "CNOT")

    def test_getitem_slice(self):
        c = Circuit("H 0\nCNOT 0 1\nM 0")
        sub = c[0:2]
        assert isinstance(sub, Circuit)
        assert len(sub) == 2
        assert sub.num_measurements == 0

    def test_negative_index(self):
        c = Circuit("H 0\nM 0")
        assert c[-1].name == "M"

    def test_add(self):
        a = Circuit("H 0")
        b = Circuit("M 0")
        c = a + b
        assert len(c) == 2
        assert len(a) == 1  # operands untouched

    def test_iadd(self):
        a = Circuit("H 0")
        a += Circuit("M 0")
        assert len(a) == 2

    def test_mul(self):
        c = Circuit("H 0") * 3
        flat = c.flattened()
        assert flat.num_ticks == 0
        # stim-compatible instruction fusion: three H 0 in a row fuse.
        assert str(flat) == "H 0 0 0"

    def test_rmul(self):
        c = 2 * Circuit("X 0")
        flat = c.flattened()
        assert len(flat) in (1, 2)  # stim may merge repeated X blocks

    def test_mul_zero_or_one(self):
        assert len((Circuit("H 0") * 1)) == 1

    def test_pop(self):
        c = Circuit("H 0\nM 0")
        c.pop()
        assert c.num_measurements == 0
        assert len(c) == 1

    def test_pop_index(self):
        c = Circuit("H 0\nX 1\nM 0")
        c.pop(0)
        assert len(c) == 2

    def test_copy_independent(self):
        a = Circuit("H 0")
        b = a.copy()
        b += Circuit("M 0")
        assert len(a) == 1
        assert a == a.copy()

    def test_eq(self):
        assert Circuit("H 0") == Circuit("H 0")
        assert Circuit("H 0") != Circuit("X 0")


class TestAppendValidation:
    def test_rotation_requires_angle(self):
        c = Circuit()
        with pytest.raises(ValueError, match="angle"):
            c.append("R_Z", [0])

    def test_rxx_requires_two_distinct(self):
        c = Circuit()
        with pytest.raises(ValueError, match="distinct"):
            c.append("R_XX", [0, 0], 0.5)

    def test_u3_requires_three_angles(self):
        c = Circuit()
        with pytest.raises(ValueError, match="three"):
            c.append("U3", [0], [0.5])

    def test_ccz_rejects_args(self):
        c = Circuit()
        with pytest.raises(ValueError, match="no arguments"):
            c.append("CCZ", [0, 1, 2], 0.5)

    def test_ccx_group_of_three(self):
        c = Circuit()
        with pytest.raises(ValueError, match="three"):
            c.append("CCX", [0, 1])

    def test_append_t_matches_text(self):
        a = Circuit()
        a.append("T", [0])
        assert a == Circuit("T 0")

    def test_append_rotation_matches_text(self):
        a = Circuit()
        a.append("R_Z", [0], 0.25)
        assert a == Circuit("R_Z(0.25) 0")

    def test_append_tpp_dag(self):
        a = Circuit()
        import tsim_tpu.stim_core as sc

        a.append(
            "TPP_DAG",
            [sc.target_x(0), sc.target_combiner(), sc.target_z(1)],
        )
        assert a == Circuit("TPP_DAG X0*Z1")


class TestRepeatBlocks:
    def test_repeat_parses(self):
        c = Circuit("REPEAT 3 {\n    H 0\n    M 0\n}")
        assert c.num_measurements == 3

    def test_repeat_flattened(self):
        c = Circuit("REPEAT 2 {\n    X 0\n}")
        assert len(c.flattened()) >= 1

    def test_repeat_with_t(self):
        c = Circuit("REPEAT 2 {\n    T 0\n}")
        assert c.tcount() == 2
        assert not c.is_clifford

    def test_nested_repeat_counters(self):
        c = Circuit("REPEAT 2 {\n    REPEAT 3 {\n        M 0\n    }\n}")
        assert c.num_measurements == 6


class TestM2D:
    def test_m2d_converts(self):
        c = Circuit(
            "X_ERROR(0.5) 0\nM 0 1\nDETECTOR rec[-2]\nOBSERVABLE_INCLUDE(0) rec[-1]"
        )
        conv = c.compile_m2d_converter()
        m = np.array([[1, 0], [0, 0], [0, 1]], dtype=np.bool_)
        dets, obs = conv.convert(measurements=m, separate_observables=True)
        np.testing.assert_array_equal(dets[:, 0], [True, False, False])
        np.testing.assert_array_equal(obs[:, 0], [False, False, True])

    def test_m2d_deterministic_baseline(self):
        # X 0 flips the measurement deterministically: the reference sample
        # absorbs it, so all-zero measurements show up as a detection event.
        c = Circuit("X 0\nM 0\nDETECTOR rec[-1]")
        conv = c.compile_m2d_converter()
        m = np.zeros((1, 1), dtype=np.bool_)
        dets = conv.convert(measurements=m)
        assert dets[0, 0]


class TestInverse:
    def test_clifford_inverse_identity(self):
        c = Circuit("H 0\nS 0\nCNOT 0 1")
        inv = c.inverse()
        combined = c + inv
        u = combined.to_matrix()
        phase = u[0, 0]
        np.testing.assert_allclose(u, phase * np.eye(4), atol=1e-8)

    def test_t_inverse(self):
        c = Circuit("T 0")
        assert "T_DAG 0" in str(c.inverse())

    def test_tpp_inverse(self):
        c = Circuit("TPP X0*Z1")
        assert "TPP_DAG" in str(c.inverse())

    def test_rotation_inverse_unitary(self):
        c = Circuit("R_Z(0.3) 0")
        u = (c + c.inverse()).to_matrix()
        phase = u[0, 0]
        np.testing.assert_allclose(u, phase * np.eye(2), atol=1e-8)

    def test_u3_inverse_swaps_phi_lambda(self):
        c = Circuit("U3(0.1, 0.2, 0.3) 0")
        inv_text = str(c.inverse())
        assert "U3(-0.1, -0.3, -0.2) 0" in inv_text

    def test_inverse_involution(self):
        c = Circuit("T 0\nR_X(0.3) 1\nCNOT 0 1")
        assert str(c.inverse().inverse()) == str(c)


class TestUnitaryEquivalence:
    """Shorthand gates match their definitional matrices (channel-state
    duality is covered in integration; here: direct small unitaries)."""

    def test_t_matrix(self):
        u = Circuit("T 0").to_matrix()
        expect = np.diag([1, np.exp(1j * np.pi / 4)])
        ratio = u[0, 0] / expect[0, 0]
        np.testing.assert_allclose(u, ratio * expect, atol=1e-8)

    def test_rz_matrix(self):
        theta = 0.3
        u = Circuit(f"R_Z({theta}) 0").to_matrix()
        expect = np.array(
            [[np.exp(-1j * np.pi * theta / 2), 0], [0, np.exp(1j * np.pi * theta / 2)]]
        )
        np.testing.assert_allclose(u, expect, atol=1e-6)

    def test_rxx_equals_spp_form(self):
        u1 = Circuit("R_XX(0.3) 0 1").to_matrix()
        u2 = Circuit("R_PAULI(0.3) X0*X1").to_matrix()
        np.testing.assert_allclose(u1, u2, atol=1e-8)

    def test_spp_squares_to_pauli(self):
        u = Circuit("SPP X0\nSPP X0").to_matrix()
        x = np.array([[0, 1], [1, 0]])
        ratio = u[0, 1] / x[0, 1]
        np.testing.assert_allclose(u, ratio * x, atol=1e-8)

    def test_ccz_matrix(self):
        u = Circuit("CCZ 0 1 2").to_matrix()
        expect = np.diag([1.0] * 7 + [-1.0])
        ratio = u[0, 0]
        np.testing.assert_allclose(u, ratio * expect, atol=1e-7)


class TestCounters:
    def test_num_qubits_sparse_targets(self):
        c = Circuit("H 5\nM 5")
        assert c.num_qubits == 6

    def test_num_detectors_and_observables(self):
        c = Circuit(
            "M 0 1\nDETECTOR rec[-1]\nDETECTOR rec[-2]\nOBSERVABLE_INCLUDE(3) rec[-1]"
        )
        assert c.num_detectors == 2
        assert c.num_observables == 4  # ids 0..3 materialize

    def test_num_ticks(self):
        c = Circuit("TICK\nH 0\nTICK")
        assert c.num_ticks == 2

    def test_mpad_counts_as_measurement(self):
        c = Circuit("MPAD 0 1")
        assert c.num_measurements == 2
