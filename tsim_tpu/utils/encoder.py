"""Transversal QEC encoders for code-level benchmark circuits.

Re-implementation of the reference's encoder utilities (reference
``tsim/utils/encoder.py``): broadcast a logical program across code blocks,
expanding DETECTOR/OBSERVABLE annotations per stabilizer generator /
logical support.
"""

from __future__ import annotations

from .. import stim_core
from ..circuit import Circuit
from ..stim_core import Circuit as StimCircuit
from ..stim_core.instruction import CircuitRepeatBlock


def broadcast_targets(groups, *, stride: int, offsets: list[int]) -> list[int]:
    out: list[int] = []
    for g in groups:
        for off in offsets:
            out.extend([t.value * stride + off for t in g])
    return out


def _transform_circuit(
    program_text: str,
    *,
    stride: int,
    offsets: list[int],
    used_qubits: set[int] | None = None,
    stabilizer_generators=None,
    observables=None,
) -> StimCircuit:
    stim_circ = Circuit(program_text)._stim_circ.flattened()
    mod = StimCircuit()
    for instr in stim_circ:
        assert not isinstance(instr, CircuitRepeatBlock)
        if len(instr.targets_copy()) == 0:
            mod.append(instr)
            continue
        if used_qubits is not None:
            used_qubits |= {t.value for g in instr.target_groups() for t in g}
        if instr.name == "DETECTOR" and stabilizer_generators:
            for gen in stabilizer_generators:
                targets = []
                for g in instr.target_groups():
                    for t in g:
                        targets.extend(
                            stim_core.target_rec(t.value * stride + off) for off in gen
                        )
                mod.append(instr.name, targets, instr.gate_args_copy() or None,
                           tag=instr.tag)
            continue
        if instr.name == "OBSERVABLE_INCLUDE" and observables:
            for obs in observables:
                targets = []
                for g in instr.target_groups():
                    for t in g:
                        targets.extend(
                            stim_core.target_rec(t.value * stride + off) for off in obs
                        )
                mod.append(instr.name, targets, instr.gate_args_copy(), tag=instr.tag)
            continue
        groups = instr.target_groups()
        if any(t.is_pauli_target for g in groups for t in g):
            # Pauli-product instructions (MPP/SPP/TPP): one product per
            # offset, preserving pauli types and combiner structure.
            targets: list = []
            for g in groups:
                for off in offsets:
                    prod: list = []
                    for t in g:
                        if prod:
                            prod.append(stim_core.target_combiner())
                        maker = {
                            "X": stim_core.target_x,
                            "Y": stim_core.target_y,
                            "Z": stim_core.target_z,
                        }[t.pauli_type]
                        prod.append(
                            maker(
                                t.value * stride + off,
                                invert=t.is_inverted_result_target,
                            )
                        )
                    targets.extend(prod)
            mod.append(instr.name, targets, instr.gate_args_copy() or None,
                       tag=instr.tag)
            continue
        new_ts = broadcast_targets(groups, stride=stride, offsets=offsets)
        mod.append(instr.name, new_ts, instr.gate_args_copy() or None, tag=instr.tag)
    return mod


class TransversalEncoder:
    """Broadcasts logical programs across n-qubit code blocks."""

    def __init__(
        self,
        n: int,
        encoding_qubit: int,
        encoding_program_text: str | None,
        stabilizer_generators: list[list[int]],
        observables: list[list[int]],
    ):
        self.n = n
        self.encoding_qubit = encoding_qubit
        self.circuit = Circuit()
        self.used_qubits: set[int] = set()
        self.encoding_program_text = encoding_program_text
        self.stabilizer_generators = stabilizer_generators
        self.observables = observables

    def initialize(self, program_text: str, encoding_program_text: str | None = None):
        encoding = encoding_program_text or self.encoding_program_text
        if not encoding:
            raise ValueError("Encoding program text is required")
        mod = _transform_circuit(
            program_text,
            stride=self.n,
            offsets=[self.encoding_qubit],
            used_qubits=self.used_qubits,
            stabilizer_generators=self.stabilizer_generators,
            observables=self.observables,
        )
        self.circuit.append_from_stim_program_text(str(mod))
        self.circuit.append_from_stim_program_text(
            str(
                _transform_circuit(
                    encoding,
                    stride=1,
                    offsets=[self.n * off for off in sorted(self.used_qubits)],
                    stabilizer_generators=self.stabilizer_generators,
                    observables=self.observables,
                )
            )
        )

    def encode_transversally(self, program_text: str) -> None:
        mod = _transform_circuit(
            program_text,
            stride=self.n,
            offsets=list(range(self.n)),
            stabilizer_generators=self.stabilizer_generators,
            observables=self.observables,
        )
        self.circuit.append_from_stim_program_text(str(mod))


class SteaneEncoder(TransversalEncoder):
    """[[7,1,3]] Steane code transversal encoder."""

    def __init__(self):
        encoding_program = """
        R 0 1 2 3 4 5
        TICK
        SQRT_Y_DAG 0 1 2 3 4 5
        TICK
        CZ 1 2 3 4 5 6
        TICK
        SQRT_Y 6
        TICK
        CZ 0 3 2 5 4 6
        TICK
        SQRT_Y 2 3 4 5 6
        TICK
        CZ 0 1 2 3 4 5
        TICK
        SQRT_Y 1 2 4
        TICK
        X 3
        Z 5 1
        TICK
        """
        super().__init__(
            n=7,
            encoding_qubit=6,
            encoding_program_text=encoding_program,
            stabilizer_generators=[[0, 1, 2, 3], [1, 2, 4, 5], [2, 3, 4, 6]],
            observables=[[0, 1, 5]],
        )


class ColorEncoder5(TransversalEncoder):
    """[[17,1,5]] 2D color code transversal encoder."""

    def __init__(self):
        encoding_program = """
        R 0 1 2 3 4 5 6 8 9 10 11 12 13 14 15 16
        SQRT_Y 0 1 2 3 4 5 6 8 9 10 11 12 13 14 15 16
        TICK
        CZ 1 3 7 10 12 14 13 16
        TICK
        SQRT_Y_DAG 7 16
        TICK
        CZ 4 7 8 10 11 14 15 16
        TICK
        SQRT_Y_DAG 4 10 14 16
        TICK
        CZ 2 4 6 8 7 9 10 13
        CZ 14 16
        TICK
        SQRT_Y 3 6 9 10 12 13
        TICK
        CZ 0 2 3 6 5 8 10 12 11 13
        TICK
        SQRT_Y 1 2 3 4 6 7 8 9 11 12 14
        TICK
        CZ 0 1 2 3 4 5 6 7 8 9 12 15
        TICK
        SQRT_Y_DAG 0 2 5 6 8 10 12
        X 14 7 5 2 1 4
        Z 11 6 4 2
        """
        stabs = [
            [0, 1, 2, 3],
            [0, 2, 4, 5],
            [4, 5, 6, 7],
            [6, 7, 8, 9],
            [11, 13, 14, 16],
            [10, 11, 12, 14],
            [12, 14, 15, 16],
            [2, 3, 5, 6, 8, 10, 11, 13],
        ]
        super().__init__(
            n=17,
            encoding_qubit=7,
            encoding_program_text=encoding_program,
            stabilizer_generators=stabs,
            observables=[[1, 3, 10, 12, 15]],
        )
