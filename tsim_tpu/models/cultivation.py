"""Magic state cultivation benchmark circuits.

Cultivation (Gidney-Shutty-Jones style; the reference benchmarks a "d=3
cultivation (1024 stabilizer terms)" workload, reference
``docs/benchmarks.svg`` panel 3 and ``README.md:98``) grows a |H_XY> magic
state on a small color code by repeatedly *checking* it: measuring the
logical H_XY = (X+Y)/sqrt(2) Clifford with an ancilla-controlled transversal
application, post-selecting on the +1 outcome, interleaved with stabilizer
measurements.

This generator produces a simulation-benchmark version on the [[7,1,3]]
color (Steane) code: the ancilla is a bare qubit (the simulation workload —
T-count, graph structure — matches the fault-tolerant version; the cat
ancilla expansion only adds Cliffords). Each controlled-H_XY uses

    C-HXY(a, q) = (I (x) W+) CZ(a, q) (I (x) W),   W = H RZ(-pi/4)

i.e. ``T_DAG q; H q; CZ a q; H q; T q`` — exactly 2 T gates per data qubit
per check, so a k-check d=3 cultivation carries 1 + 14k T gates.

Validated against the statevector oracle in
``tests/integration/test_cultivation.py``: all detectors are deterministic
zero on the noiseless circuit and the logical X observable has mean
(1 - 1/sqrt(2))/2.
"""

from __future__ import annotations

from ..circuit import Circuit
from ..utils.encoder import SteaneEncoder

# [[7,1,3]] self-dual CSS generators / logical support (matches the
# SteaneEncoder layout in utils/encoder.py).
_STABS = [[0, 1, 2, 3], [1, 2, 4, 5], [2, 3, 4, 6]]
_LOGICAL = [0, 1, 5]
_N = 7
_ANCILLA = 7


def _check_round(noise: float) -> list[str]:
    """One H_XY check: ancilla |+>, transversal C-HXY, MX ancilla."""
    lines = [f"RX {_ANCILLA}"]
    if noise:
        lines.append(f"Z_ERROR({noise}) {_ANCILLA}")
    for q in range(_N):
        lines.append(f"T_DAG {q}")
        lines.append(f"H {q}")
        lines.append(f"CZ {_ANCILLA} {q}")
        if noise:
            lines.append(f"DEPOLARIZE2({noise}) {_ANCILLA} {q}")
        lines.append(f"H {q}")
        lines.append(f"T {q}")
    # Transversal H_XY on the [[7,1,3]] code implements Z_L * H_XY,L (the
    # weight-3 logical Y picks up a sign: Y^(x)3 = -Y_L); a controlled-Z_L
    # correction makes the ancilla measure logical H_XY exactly.
    for q in _LOGICAL:
        lines.append(f"CZ {_ANCILLA} {q}")
        if noise:
            lines.append(f"DEPOLARIZE2({noise}) {_ANCILLA} {q}")
    # The controlled transversal picks up a global phase i on the target
    # unitary (C-(i V) kicks the ancilla by S): undo it so the +1 outcome
    # maps to measurement result 0.
    lines.append(f"S_DAG {_ANCILLA}")
    if noise:
        lines.append(f"Z_ERROR({noise}) {_ANCILLA}")
    lines.append(f"MX {_ANCILLA}")
    lines.append("DETECTOR rec[-1]")
    return lines


def _stabilizer_round(noise: float) -> list[str]:
    """Measure all X- and Z-type stabilizer generators via MPP."""
    lines = []
    for basis in ("X", "Z"):
        for gen in _STABS:
            prod = "*".join(f"{basis}{q}" for q in gen)
            if noise:
                lines.append(f"MPP({noise}) {prod}")
            else:
                lines.append(f"MPP {prod}")
            lines.append("DETECTOR rec[-1]")
    return lines


def cultivation_logical(
    p: float = 0.001, checks: int = 1, noise: float | None = None
) -> Circuit:
    """Unencoded (single-qubit) cultivation: inject |H_XY>, check, read out.

    The logical-level workload (T-count 1 + 2 * checks): data qubit 0 holds
    |H_XY> = T|+>, each check measures H_XY via an ancilla-controlled
    C-HXY(1, 0); the X-basis readout observable has mean (1 - 1/sqrt(2))/2.
    Small enough for statevector-oracle integration tests.
    """
    noise = p / 10 if noise is None else noise
    lines = ["R 0", "H 0", "T 0"]
    if p:
        lines.append(f"DEPOLARIZE1({p}) 0")
    for _ in range(checks):
        lines.append("RX 1")
        lines.append("T_DAG 0")
        lines.append("H 0")
        lines.append("CZ 1 0")
        if noise:
            lines.append(f"DEPOLARIZE2({noise}) 1 0")
        lines.append("H 0")
        lines.append("T 0")
        lines.append("MX 1")
        lines.append("DETECTOR rec[-1]")
    lines.append("MX 0")
    lines.append("OBSERVABLE_INCLUDE(0) rec[-1]")
    return Circuit("\n".join(lines))


def cultivation_d3(
    p: float = 0.001,
    checks: int = 1,
    stabilizer_rounds: int = 1,
    noise: float | None = None,
) -> Circuit:
    """d=3 cultivation benchmark: inject |H_XY>, check ``checks`` times.

    Args:
        p: injection depolarizing noise.
        checks: number of H_XY check rounds (T-count 1 + 14 * checks).
        stabilizer_rounds: MPP stabilizer-measurement rounds after checks.
        noise: gate noise inside checks/stabilizer rounds (default p / 10).
    """
    noise = p / 10 if noise is None else noise

    encoder = SteaneEncoder()
    inject = "R 0\nH 0\nT 0\n"
    if p:
        inject += f"DEPOLARIZE1({p}) 0\n"
    encoder.initialize(inject)
    lines = [str(encoder.circuit)]

    for _ in range(checks):
        lines.extend(_check_round(noise))
    for _ in range(stabilizer_rounds):
        lines.extend(_stabilizer_round(noise))

    # Destructive transversal X-basis readout: stabilizer detectors from
    # data bits plus the logical X observable (<X_L> = 1/sqrt(2) on |H_XY>).
    if noise:
        lines.append(f"Z_ERROR({noise}) " + " ".join(str(q) for q in range(_N)))
    lines.append("MX " + " ".join(str(q) for q in range(_N)))
    for gen in _STABS:
        recs = " ".join(f"rec[{q - _N}]" for q in gen)
        lines.append(f"DETECTOR {recs}")
    obs = " ".join(f"rec[{q - _N}]" for q in _LOGICAL)
    lines.append(f"OBSERVABLE_INCLUDE(0) {obs}")

    return Circuit("\n".join(lines))
