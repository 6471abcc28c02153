"""Parser from Stim-dialect circuits to ZX graph representations.

Semantics mirror reference ``tsim/core/parse.py``: parametric tags on ``I``
and ``SPP`` instructions, T tags on ``S``/``SPP``, Pauli-product iteration
with full Pauli algebra, correlated-error chains, detector/observable
annotations, and generic gate dispatch with invert / classical-control
flags.
"""

from __future__ import annotations

import re
from fractions import Fraction
from typing import Iterator, Literal

from ..stim_core import Circuit as StimCircuit
from ..stim_core.instruction import CircuitInstruction, CircuitRepeatBlock
from .instructions import (
    GATE_TABLE,
    GraphRepresentation,
    correlated_error,
    detector,
    finalize_correlated_error,
    mpad,
    mpp,
    observable_include,
    r_pauli,
    r_x,
    r_y,
    r_z,
    spp,
    tick,
    tpp,
    u3,
)
from .tags import is_t_tag

_PARAMETRIC_GATE_PARAMS: dict[str, frozenset[str]] = {
    "R_X": frozenset({"theta"}),
    "R_Y": frozenset({"theta"}),
    "R_Z": frozenset({"theta"}),
    "R_PAULI": frozenset({"theta"}),
    "U3": frozenset({"theta", "phi", "lambda"}),
}

R_PAULI_MAX_QUBITS = 64

# Non-dyadic angles (decimal strings like 0.3*pi parse to denominator 10^16)
# are canonicalized to the nearest 2^-40 dyadic at the parser chokepoint.
# Clifford/T angles (denominator 1, 2, 4, 8...) are exactly representable and
# untouched; arbitrary angles are evaluated in double precision downstream
# (stabilizer decomposition pulls them out as float cos/sin factors), so the
# ~1e-12 rounding is far below sampling precision. Keeping every phase
# dyadic bounds Fraction arithmetic (sums take the max denominator instead
# of the lcm product, which grew to >100-bit integers with decimal inputs)
# and keeps the native ZX engine's int64 fractions exact.
_ANGLE_DEN_BITS = 40


def canonical_angle(f: Fraction) -> Fraction:
    den = f.denominator
    if den & (den - 1) == 0 and den.bit_length() <= _ANGLE_DEN_BITS + 1:
        return f
    scale = 1 << _ANGLE_DEN_BITS
    return Fraction(round(f * scale), scale)


_TAG_RE = re.compile(r"^(\w+)\((.*)\)$")
_PARAM_RE = re.compile(r"^(\w+)=([-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?)\*pi$")


def parse_parametric_tag(
    instruction: CircuitInstruction,
) -> tuple[str, dict[str, Fraction]] | None:
    """Parse a parametric tag like ``R_Z(theta=0.3*pi)`` on an instruction."""
    tag = instruction.tag
    err_prefix = f"Could not parse instruction {str(instruction)!r}"
    m = _TAG_RE.match(tag)
    if not m:
        return None
    gate_name = m.group(1)
    params: dict[str, Fraction] = {}
    for param in m.group(2).split(","):
        param = param.strip()
        if not param:
            continue
        pm = _PARAM_RE.match(param)
        if not pm:
            raise ValueError(f"{err_prefix}. Malformed parametric tag {tag!r}")
        params[pm.group(1)] = canonical_angle(Fraction(pm.group(2)))
    expected = _PARAMETRIC_GATE_PARAMS.get(gate_name)
    if expected is None:
        raise ValueError(f"{err_prefix}. Unknown parametric gate {gate_name!r}")
    if params.keys() != expected:
        raise ValueError(
            f"{err_prefix}. Parametric tag {tag!r} has parameters "
            f"{sorted(params)}, expected {sorted(expected)}"
        )
    return gate_name, params


_PAULI_PRODUCT: dict[tuple[str, str], tuple[str, int]] = {
    ("X", "Y"): ("Z", 1),
    ("X", "Z"): ("Y", 3),
    ("Y", "X"): ("Z", 3),
    ("Y", "Z"): ("X", 1),
    ("Z", "X"): ("Y", 1),
    ("Z", "Y"): ("X", 3),
}


def _validate_r_pauli_targets(instruction: CircuitInstruction) -> None:
    targets = instruction.targets_copy()
    total = sum(1 for t in targets if not t.is_combiner)
    if total > R_PAULI_MAX_QUBITS:
        raise ValueError(
            f"R_PAULI supports at most {R_PAULI_MAX_QUBITS} qubits per instruction, "
            f"got {total}."
        )
    seen: set[int] = set()
    for idx, t in enumerate(targets):
        if t.is_combiner:
            continue
        if t.value in seen:
            raise ValueError(
                f"R_PAULI target qubits must be distinct within a product, "
                f"got repeated qubit {t.value} in {str(instruction)!r}."
            )
        seen.add(t.value)
        nxt = idx + 1
        if nxt >= len(targets) or not targets[nxt].is_combiner:
            seen = set()


def _iter_pauli_products(
    instruction: CircuitInstruction,
) -> Iterator[tuple[list[tuple[str, int]], bool]]:
    """Yield (paulis, invert) per product, applying Pauli algebra on repeats."""
    qubit_pauli: dict[int, str] = {}
    sign = 0  # power of i mod 4
    invert = False
    targets = instruction.targets_copy()
    for idx, t in enumerate(targets):
        if t.is_combiner:
            continue
        if t.is_x_target:
            pt = "X"
        elif t.is_y_target:
            pt = "Y"
        elif t.is_z_target:
            pt = "Z"
        else:
            raise ValueError(
                f"Invalid Pauli target in instruction {instruction.name}: {t}"
            )
        invert ^= t.is_inverted_result_target
        q = t.value
        if q not in qubit_pauli:
            qubit_pauli[q] = pt
        elif qubit_pauli[q] == pt:
            del qubit_pauli[q]
        else:
            res, delta = _PAULI_PRODUCT[qubit_pauli[q], pt]
            qubit_pauli[q] = res
            sign = (sign + delta) % 4
        nxt = idx + 1
        if nxt >= len(targets) or not targets[nxt].is_combiner:
            if sign % 2 == 1:
                raise ValueError(f"{instruction} acted on an anti-Hermitian operator")
            paulis = [(p, q) for q, p in sorted(qubit_pauli.items())]
            yield paulis, invert ^ (sign == 2)
            qubit_pauli = {}
            sign = 0
            invert = False


def parse_stim_circuit(stim_circuit: StimCircuit) -> GraphRepresentation:
    """Parse a (stim-core) circuit into a GraphRepresentation."""
    b = GraphRepresentation()

    for instruction in stim_circuit.flattened():
        assert not isinstance(instruction, CircuitRepeatBlock)
        name = instruction.name
        if name == "SHIFT_COORDS":
            continue
        if any(t.is_sweep_bit_target for t in instruction.targets_copy()):
            raise NotImplementedError(
                f"Sweep bit targets (e.g. sweep[N]) are not supported "
                f"in instruction {str(instruction)!r}"
            )
        if name == "S" and is_t_tag(instruction.tag):
            name = "T"
        elif name == "S_DAG" and is_t_tag(instruction.tag):
            name = "T_DAG"

        if name == "I" and instruction.tag:
            result = parse_parametric_tag(instruction)
            if result is not None:
                gate_name, params = result
                for t in instruction.targets_copy():
                    q = t.value
                    if gate_name == "R_Z":
                        r_z(b, q, params["theta"])
                    elif gate_name == "R_X":
                        r_x(b, q, params["theta"])
                    elif gate_name == "R_Y":
                        r_y(b, q, params["theta"])
                    elif gate_name == "U3":
                        u3(b, q, params["theta"], params["phi"], params["lambda"])
                    else:
                        raise ValueError(f"Unknown parametric gate: {gate_name}")
                continue

        if name == "TICK":
            tick(b)
            continue
        if name == "MPP":
            args = instruction.gate_args_copy()
            p = args[0] if args else 0
            for paulis, invert in _iter_pauli_products(instruction):
                mpp(b, paulis, invert, p=p)
            continue
        if name in ("SPP", "SPP_DAG") and is_t_tag(instruction.tag):
            is_dag = name == "SPP_DAG"
            for paulis, invert in _iter_pauli_products(instruction):
                tpp(b, paulis, dagger=is_dag ^ invert)
            continue
        if name in ("SPP", "SPP_DAG") and instruction.tag:
            parsed = parse_parametric_tag(instruction)
            if parsed is not None and parsed[0] == "R_PAULI":
                params = parsed[1]
                _validate_r_pauli_targets(instruction)
                is_dag = name == "SPP_DAG"
                for paulis, invert in _iter_pauli_products(instruction):
                    r_pauli(b, paulis, params["theta"], dagger=is_dag ^ invert)
                continue
        if name in ("SPP", "SPP_DAG"):
            is_dag = name == "SPP_DAG"
            for paulis, invert in _iter_pauli_products(instruction):
                spp(b, paulis, dagger=is_dag ^ invert)
            continue
        if name == "MPAD":
            args = instruction.gate_args_copy()
            p = args[0] if args else 0
            for t in instruction.targets_copy():
                mpad(b, t.value, p=p)
            continue
        if name in ("E", "CORRELATED_ERROR", "ELSE_CORRELATED_ERROR"):
            if name != "ELSE_CORRELATED_ERROR":
                finalize_correlated_error(b)
            qubits = [t.value for t in instruction.targets_copy()]
            types: list[Literal["X", "Y", "Z"]] = []
            for t in instruction.targets_copy():
                if t.is_x_target:
                    types.append("X")
                elif t.is_y_target:
                    types.append("Y")
                elif t.is_z_target:
                    types.append("Z")
                else:
                    raise ValueError(f"Invalid target: {t}")
            correlated_error(b, qubits, types, instruction.gate_args_copy()[0])
            continue
        if name == "DETECTOR":
            detector(b, [t.value for t in instruction.targets_copy()])
            continue
        if name == "OBSERVABLE_INCLUDE":
            targets_copy = instruction.targets_copy()
            for t in targets_copy:
                if not t.is_measurement_record_target:
                    raise ValueError(
                        f"OBSERVABLE_INCLUDE with Pauli targets is not "
                        f"supported (only measurement record targets "
                        f"like rec[-1] are supported). Got instruction "
                        f"{str(instruction)!r}"
                    )
            observable_include(
                b,
                [t.value for t in targets_copy],
                int(instruction.gate_args_copy()[0]),
            )
            continue

        if name not in GATE_TABLE:
            raise ValueError(f"Unknown gate: {name}")
        gate_func, num_qubits = GATE_TABLE[name]
        targets = [t.value for t in instruction.targets_copy()]
        invert = [t.is_inverted_result_target for t in instruction.targets_copy()]
        is_cc = [t.is_measurement_record_target for t in instruction.targets_copy()]
        args = instruction.gate_args_copy()

        for i0 in range(0, len(targets), num_qubits):
            chunk = targets[i0 : i0 + num_qubits]
            cc_chunk = is_cc[i0 : i0 + num_qubits]
            chunk_inverted = False
            for j in range(min(num_qubits, len(targets) - i0)):
                chunk_inverted ^= invert[i0 + j]
            assert not (invert[i0] and is_cc[i0])
            if chunk_inverted:
                gate_func(b, *chunk, *args, invert=True)
            elif any(cc_chunk):
                gate_func(b, *chunk, *args, classically_controlled=cc_chunk)
            else:
                gate_func(b, *chunk, *args)

    finalize_correlated_error(b)

    for idx in range(stim_circuit.num_observables):
        if idx not in b.observables_dict:
            observable_include(b, [], idx)
    b.observables_dict = {i: b.observables_dict[i] for i in sorted(b.observables_dict)}
    return b
