"""Half-pi parametric rotations -> Clifford gate expansion tables.

Mirrors reference ``tsim/utils/clifford.py``: detection of Clifford circuits
and expansion of half-pi-angle tagged rotations into plain Clifford gates.
"""

from __future__ import annotations

from fractions import Fraction

from ..core.parse import parse_parametric_tag
from ..core.tags import is_t_tag
from ..stim_core import Circuit as StimCircuit
from ..stim_core.instruction import CircuitInstruction, CircuitRepeatBlock

U3_CLIFFORD: dict[tuple[int, int, int], list[str]] = {
    (0, 0, 0): ["I"],
    (0, 0, 1): ["S"],
    (0, 0, 2): ["Z"],
    (0, 0, 3): ["S_DAG"],
    (0, 1, 0): ["S"],
    (0, 1, 1): ["Z"],
    (0, 1, 2): ["S_DAG"],
    (0, 1, 3): ["I"],
    (1, 0, 0): ["SQRT_Y"],
    (1, 0, 1): ["S", "SQRT_Y"],
    (1, 0, 2): ["H"],
    (1, 0, 3): ["S_DAG", "SQRT_Y"],
    (1, 1, 0): ["S", "SQRT_X_DAG"],
    (1, 1, 1): ["Z", "SQRT_X_DAG"],
    (1, 1, 2): ["S_DAG", "SQRT_X_DAG"],
    (1, 1, 3): ["SQRT_X_DAG"],
    (1, 2, 0): ["Z", "SQRT_Y_DAG"],
    (1, 2, 1): ["S_DAG", "SQRT_Y_DAG"],
    (1, 2, 2): ["SQRT_Y_DAG"],
    (1, 2, 3): ["S", "SQRT_Y_DAG"],
    (1, 3, 0): ["S_DAG", "SQRT_X"],
    (1, 3, 1): ["SQRT_X"],
    (1, 3, 2): ["S", "SQRT_X"],
    (1, 3, 3): ["Z", "SQRT_X"],
    (2, 0, 0): ["Y"],
    (2, 0, 1): ["S", "Y"],
    (2, 0, 2): ["X"],
    (2, 0, 3): ["S_DAG", "Y"],
    (2, 1, 0): ["Y", "S"],
    (2, 1, 1): ["Y"],
    (2, 1, 2): ["S", "Y"],
    (2, 1, 3): ["X"],
}

RZ_CLIFFORD = {0: "I", 1: "S", 2: "Z", 3: "S_DAG"}
RX_CLIFFORD = {0: "I", 1: "SQRT_X", 2: "X", 3: "SQRT_X_DAG"}
RY_CLIFFORD = {0: "I", 1: "SQRT_Y", 2: "Y", 3: "SQRT_Y_DAG"}


def _to_half_pi_index(phase: Fraction) -> int | None:
    if phase.denominator > 2:
        return None
    return int(phase * 2) % 4


def _equivalent_u3_key(t: int, p: int, lam: int) -> tuple[int, int, int]:
    """U3(t, p, l) == U3(2pi - t, p + pi, l + pi) up to global phase."""
    return ((4 - t) % 4, (p + 2) % 4, (lam + 2) % 4)


def parametric_to_clifford_gates(gate_name: str, params) -> list[str] | None:
    if gate_name in ("R_X", "R_Y", "R_Z"):
        idx = _to_half_pi_index(params["theta"])
        if idx is None:
            return None
        table = {"R_Z": RZ_CLIFFORD, "R_X": RX_CLIFFORD, "R_Y": RY_CLIFFORD}[gate_name]
        return [table[idx]]
    if gate_name == "U3":
        keys = tuple(_to_half_pi_index(params[k]) for k in ("theta", "phi", "lambda"))
        if any(k is None for k in keys):
            return None
        gates = U3_CLIFFORD.get(keys)  # type: ignore[arg-type]
        if gates is None:
            gates = U3_CLIFFORD.get(_equivalent_u3_key(*keys))  # type: ignore[misc]
        assert gates is not None
        return list(gates)
    return None


def is_clifford(source: StimCircuit) -> bool:
    """True iff every instruction is Clifford (recursing into REPEATs)."""

    def half_pi(phase: Fraction) -> bool:
        return phase.denominator <= 2

    for instr in source:
        if isinstance(instr, CircuitRepeatBlock):
            if not is_clifford(instr.body_copy()):
                return False
            continue
        if instr.name in ("S", "S_DAG", "SPP", "SPP_DAG") and is_t_tag(instr.tag):
            return False
        if instr.name in ("SPP", "SPP_DAG") and instr.tag:
            result = parse_parametric_tag(instr)
            if result is not None and not half_pi(result[1]["theta"]):
                return False
            continue
        if instr.name == "I" and instr.tag:
            result = parse_parametric_tag(instr)
            if result is None:
                continue
            gate_name, params = result
            if gate_name in ("R_X", "R_Y", "R_Z"):
                if not half_pi(params["theta"]):
                    return False
            elif gate_name == "U3":
                if not all(half_pi(params[k]) for k in ("theta", "phi", "lambda")):
                    return False
            else:
                return False
    return True


def expand_clifford_rotations(source: StimCircuit) -> StimCircuit:
    """Expand half-pi parametric rotations into plain Clifford gates."""
    out = StimCircuit()
    for instr in source:
        if isinstance(instr, CircuitRepeatBlock):
            out.append(
                CircuitRepeatBlock(
                    instr.repeat_count, expand_clifford_rotations(instr.body_copy())
                )
            )
            continue
        if _expand_clifford_spp(instr, out):
            continue
        expansion = _try_clifford_expansion(instr)
        if expansion is not None:
            gates, targets = expansion
            for gate in gates:
                out.append(gate, targets, None)
        else:
            out.append(instr)
    return out


def _expand_clifford_spp(instr: CircuitInstruction, out: StimCircuit) -> bool:
    if instr.name not in ("SPP", "SPP_DAG") or not instr.tag:
        return False
    parsed = parse_parametric_tag(instr)
    if parsed is None or parsed[0] != "R_PAULI":
        return False
    idx = _to_half_pi_index(parsed[1]["theta"])
    if idx is None:
        return False
    targets = instr.targets_copy()
    if instr.name == "SPP_DAG":
        idx = (4 - idx) % 4
    for gate in {0: [], 1: ["SPP"], 2: ["SPP", "SPP"], 3: ["SPP_DAG"]}[idx]:
        out.append(gate, targets, None)
    return True


def _try_clifford_expansion(instr: CircuitInstruction):
    if instr.name != "I" or not instr.tag:
        return None
    parsed = parse_parametric_tag(instr)
    if parsed is None:
        return None
    gate_name, params = parsed
    gates = parametric_to_clifford_gates(gate_name, params)
    if gates is None:
        return None
    return gates, [t.value for t in instr.targets_copy()]
