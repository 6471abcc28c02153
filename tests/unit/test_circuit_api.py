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


# --------------------------------------------------------------------------
# Expanded API battery (semantic spec: reference test/unit/test_circuit.py).
# --------------------------------------------------------------------------
class TestRepeatBlockPreservation:
    def test_mul_preserves_repeat_block(self):
        c = Circuit("REPEAT 2 {\nT 0\n}")
        d = c * 2
        assert "REPEAT" in str(d)
        assert d.tcount() == 4

    def test_imul_preserves_repeat_block(self):
        c = Circuit("REPEAT 2 {\nH 0\n}")
        c *= 3
        assert "REPEAT" in str(c)
        assert len(c) == 1

    def test_getitem_repeat_block(self):
        c = Circuit("H 0\nREPEAT 2 {\nM 0\n}")
        blk = c[1]
        assert type(blk).__name__ == "CircuitRepeatBlock"

    def test_getitem_slice_with_repeat_block(self):
        c = Circuit("H 0\nREPEAT 2 {\nM 0\n}\nX 1")
        sub = c[1:]
        assert isinstance(sub, Circuit)
        assert sub.num_measurements == 2

    def test_pop_repeat_block(self):
        c = Circuit("H 0\nREPEAT 2 {\nM 0\n}")
        blk = c.pop()
        assert type(blk).__name__ == "CircuitRepeatBlock"
        assert len(c) == 1

    def test_copy_preserves_repeat_block(self):
        c = Circuit("REPEAT 5 {\nT 0\nM 0\n}")
        d = c.copy()
        assert str(d) == str(c)
        d.pop()
        assert len(c) == 1


class TestIsCliffordFamilies:
    def test_accepts_stim_gates(self):
        assert Circuit("H 0\nCNOT 0 1\nS 1\nM 0 1").is_clifford

    def test_accepts_half_pi_parametric(self):
        assert Circuit("I[R_Z(theta=0.5*pi)] 0").is_clifford
        assert Circuit("I[R_X(theta=-0.5*pi)] 0").is_clifford
        assert Circuit("I[R_Y(theta=1*pi)] 0").is_clifford

    def test_rejects_t_gate(self):
        assert not Circuit("T 0").is_clifford

    def test_rejects_tpp(self):
        assert not Circuit("TPP Z0*Z1").is_clifford

    def test_rejects_tpp_dag(self):
        assert not Circuit("TPP_DAG X0").is_clifford

    def test_rejects_non_clifford_rotation(self):
        assert not Circuit("I[R_Z(theta=0.3*pi)] 0").is_clifford

    def test_rejects_non_clifford_u3(self):
        assert not Circuit(
            "I[U3(theta=0.3*pi, phi=0*pi, lambda=0*pi)] 0"
        ).is_clifford

    def test_accepts_clifford_u3(self):
        assert Circuit(
            "I[U3(theta=0.5*pi, phi=0.5*pi, lambda=1.5*pi)] 0"
        ).is_clifford

    def test_repeat_block_clifford_body(self):
        assert Circuit("REPEAT 3 {\nH 0\nS 0\n}").is_clifford

    def test_repeat_block_half_pi_parametric(self):
        assert Circuit("REPEAT 3 {\nI[R_Z(theta=0.5*pi)] 0\n}").is_clifford

    def test_repeat_block_rejects_non_clifford_body(self):
        assert not Circuit("REPEAT 3 {\nT 0\n}").is_clifford

    def test_repeat_block_rejects_non_clifford_parametric(self):
        assert not Circuit(
            "REPEAT 3 {\nI[R_Z(theta=0.25*pi)] 0\n}"
        ).is_clifford


class TestStimCircuitProperty:
    def test_expands_half_pi_parametric(self):
        sc = Circuit("I[R_Z(theta=0.5*pi)] 0").stim_circuit
        assert "S 0" in str(sc)

    def test_keeps_t_as_tagged_s(self):
        sc = Circuit("T 0").stim_circuit
        assert "S[T] 0" in str(sc)

    def test_repeat_block_expands_half_pi_parametric(self):
        sc = Circuit("REPEAT 3 {\nI[R_Z(theta=0.5*pi)] 0\n}").stim_circuit
        s = str(sc)
        assert "REPEAT 3" in s and "S 0" in s

    def test_repeat_block_keeps_non_clifford_parametric(self):
        sc = Circuit("REPEAT 2 {\nI[R_Z(theta=0.3*pi)] 0\n}").stim_circuit
        assert "R_Z" in str(sc)


class TestPauliRotationCliffordMatrices:
    @pytest.mark.parametrize(
        "tag_gate,stim_gate",
        [
            ("R_X(theta=0.5*pi)", "SQRT_X"),
            ("R_X(theta=-0.5*pi)", "SQRT_X_DAG"),
            ("R_Y(theta=0.5*pi)", "SQRT_Y"),
            ("R_Y(theta=-0.5*pi)", "SQRT_Y_DAG"),
            ("R_Z(theta=0.5*pi)", "S"),
            ("R_Z(theta=-0.5*pi)", "S_DAG"),
            ("R_X(theta=1*pi)", "X"),
            ("R_Y(theta=1*pi)", "Y"),
            ("R_Z(theta=1*pi)", "Z"),
        ],
    )
    def test_half_pi_rotation_matches_clifford(self, tag_gate, stim_gate):
        m1 = Circuit(f"I[{tag_gate}] 0").to_matrix()
        m2 = Circuit(f"{stim_gate} 0").to_matrix()
        # equal up to global phase
        ratio = m1 @ np.linalg.inv(m2)
        assert ratio == pytest.approx(ratio[0, 0] * np.eye(2))
        assert abs(abs(ratio[0, 0]) - 1) < 1e-9


class TestInverseFamilies:
    def _check_unitary_inverse(self, text):
        c = Circuit(text)
        m = c.to_matrix()
        mi = c.inverse().to_matrix()
        prod = m @ mi
        assert prod == pytest.approx(prod[0, 0] * np.eye(m.shape[0]))

    def test_inverse_r_x(self):
        self._check_unitary_inverse("I[R_X(theta=0.3*pi)] 0")

    def test_inverse_r_y(self):
        self._check_unitary_inverse("I[R_Y(theta=-0.2*pi)] 0")

    def test_inverse_r_xx(self):
        self._check_unitary_inverse("R_XX(0.3) 0 1")

    def test_inverse_r_yy_r_zz(self):
        self._check_unitary_inverse("R_YY(0.345) 0 1")
        self._check_unitary_inverse("R_ZZ(-0.2) 0 1")

    def test_inverse_r_pauli(self):
        self._check_unitary_inverse("SPP[R_PAULI(theta=0.15*pi)] X0*Z1")

    def test_inverse_mixed_circuit(self):
        self._check_unitary_inverse(
            "H 0\nT 0\nCNOT 0 1\nI[R_Z(theta=0.3*pi)] 1\nS 0"
        )

    def test_inverse_with_repeat_block(self):
        c = Circuit("REPEAT 2 {\nT 0\n}")
        prod = (c + c.inverse()).to_matrix()
        assert prod == pytest.approx(prod[0, 0] * np.eye(2))

    def test_inverse_t(self):
        c = Circuit("T 0")
        assert c.inverse().tcount() == 1
        prod = (c + c.inverse()).to_matrix()
        assert prod == pytest.approx(np.eye(2))

    def test_r_pauli_long_product_roundtrip(self):
        c = Circuit("SPP[R_PAULI(theta=0.1*pi)] X0*Y1*Z2*X3")
        prod = (c + c.inverse()).to_matrix()
        assert prod == pytest.approx(prod[0, 0] * np.eye(16))


class TestApproxEquals:
    def test_identical(self):
        a = Circuit("I[R_Z(theta=0.3*pi)] 0")
        assert a.approx_equals(Circuit("I[R_Z(theta=0.3*pi)] 0"), atol=1e-12)

    def test_within_tolerance(self):
        # approx compares instruction arguments (noise strengths).
        a = Circuit("DEPOLARIZE1(0.010) 0")
        b = Circuit("DEPOLARIZE1(0.011) 0")
        assert a.approx_equals(b, atol=0.01)

    def test_outside_tolerance(self):
        a = Circuit("DEPOLARIZE1(0.01) 0")
        b = Circuit("DEPOLARIZE1(0.05) 0")
        assert not a.approx_equals(b, atol=0.01)

    def test_with_non_circuit(self):
        assert not Circuit("H 0").approx_equals(object(), atol=1e-3)


class TestTaggedControlledGates:
    def test_ccz_matrix(self):
        m = Circuit("CCZ 0 1 2").to_matrix()
        want = np.eye(8, dtype=complex)
        want[7, 7] = -1
        assert m == pytest.approx(want)

    def test_ccx_matrix(self):
        m = Circuit("CCX 0 1 2").to_matrix()
        want = np.eye(8, dtype=complex)
        want[[6, 7], :] = want[[7, 6], :]
        assert m == pytest.approx(want)

    def test_ccz_symmetric_in_controls(self):
        m1 = Circuit("CCZ 0 1 2").to_matrix()
        m2 = Circuit("CCZ 2 0 1").to_matrix()
        assert m1 == pytest.approx(m2)

    def test_ccz_tcount(self):
        assert Circuit("CCZ 0 1 2").tcount() == 7


class TestStrReprEdgeCases:
    def test_str_empty(self):
        assert str(Circuit("")) == ""

    def test_len_empty(self):
        assert len(Circuit("")) == 0

    def test_num_ticks_empty(self):
        assert Circuit("").num_ticks == 0

    def test_num_ticks_counts_repeat(self):
        assert Circuit("TICK\nREPEAT 3 {\nTICK\n}").num_ticks == 4

    def test_append_from_stim_program_text(self):
        c = Circuit("H 0")
        c.append_from_stim_program_text("T 0\nM 0")
        assert c.tcount() == 1
        assert c.num_measurements == 1

    def test_append_from_stim_program_text_empty(self):
        c = Circuit("H 0")
        c.append_from_stim_program_text("")
        assert len(c) == 1

    def test_from_stim_program(self):
        from tsim_tpu.stim_core import Circuit as StimCircuit

        sc = StimCircuit("H 0\nM 0")
        c = Circuit.from_stim_program(sc)
        assert c.num_measurements == 1

    def test_eq_different_type(self):
        assert Circuit("H 0") != "H 0"

    def test_getitem_type_error(self):
        with pytest.raises(TypeError):
            Circuit("H 0")["x"]


class TestWithoutNoiseAnnotations:
    def test_without_noise_strips_channels(self):
        c = Circuit("X_ERROR(0.1) 0\nH 0\nM(0.01) 0\nDETECTOR rec[-1]")
        clean = c.without_noise()
        assert "X_ERROR" not in str(clean)
        assert "M 0" in str(clean)
        assert clean.num_detectors == 1

    def test_without_annotations_strips_detectors(self):
        c = Circuit("H 0\nM 0\nDETECTOR rec[-1]\nOBSERVABLE_INCLUDE(0) rec[-1]")
        bare = c.without_annotations()
        assert bare.num_detectors == 0
        assert bare.num_observables == 0
        assert bare.num_measurements == 1

    def test_without_annotations_repeat_block(self):
        c = Circuit("REPEAT 2 {\nM 0\nDETECTOR rec[-1]\n}")
        bare = c.without_annotations()
        assert bare.num_detectors == 0
        assert bare.num_measurements == 2


class TestGraphSurfaces:
    def test_get_graph_smoke(self):
        g = Circuit("H 0\nT 0\nCNOT 0 1").get_graph()
        assert g.num_vertices() > 0

    def test_get_sampling_graph_measurements(self):
        g = Circuit("H 0\nM 0").get_sampling_graph()
        assert g.num_vertices() > 0

    def test_get_sampling_graph_detectors(self):
        g = Circuit("H 0\nM 0\nDETECTOR rec[-1]").get_sampling_graph(
            sample_detectors=True
        )
        assert g.num_vertices() > 0

    def test_to_tensor_shape(self):
        t = Circuit("H 0\nCNOT 0 1").to_tensor()
        assert t.size == 16

    def test_detector_error_model_basic(self):
        dem = Circuit(
            "X_ERROR(0.25) 0\nM 0\nDETECTOR rec[-1]"
        ).detector_error_model()
        s = str(dem)
        assert "error(0.25)" in s and "D0" in s
