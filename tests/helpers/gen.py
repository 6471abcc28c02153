"""Random circuit generator for integration tests."""

import random


def gen_circuit_text(
    qubits: int,
    depth: int,
    include_measurements: bool = True,
    gate_weights: dict | None = None,
    seed: int | None = None,
) -> str:
    """Random Stim-dialect circuit text with tsim shorthand gates."""
    rng = random.Random(seed)
    default = {
        "T": 1, "S": 1, "H": 1, "SQRT_X": 1, "SQRT_Y": 1, "CNOT": 1,
        "X": 1, "Z": 1, "Y": 1,
    }
    weights = gate_weights if gate_weights is not None else default
    arity = {
        "T": 1, "T_DAG": 1, "S": 1, "S_DAG": 1, "H": 1, "SQRT_X": 1, "SQRT_Y": 1,
        "X": 1, "Y": 1, "Z": 1, "CNOT": 2, "CZ": 2, "CY": 2, "ISWAP": 2,
        "SQRT_XX": 2, "SQRT_ZZ": 2,
        "X_ERROR(1)": 1, "Z_ERROR(1)": 1,
        "X_ERROR(0.4)": 1, "Z_ERROR(0.4)": 1, "Y_ERROR(0.4)": 1,
        "DEPOLARIZE1(0.4)": 1, "DEPOLARIZE2(0.5)": 2,
        "PAULI_CHANNEL_1(0.3, 0.2, 0.1)": 1,
        "R_X(0.31)": 1, "R_Y(0.32)": 1, "R_Z(0.33)": 1,
        "U3(0.34, 0.21, 0.46)": 1,
        "TPP2": 2, "R_PAULI2": 2,
    }
    names = [n for n in weights if weights[n] > 0]
    lines = [f"R {q}" for q in range(qubits)]
    for _ in range(depth):
        name = rng.choices(names, weights=[weights[n] for n in names], k=1)[0]
        k = arity[name]
        if k > qubits:
            continue
        targets = rng.sample(range(qubits), k)
        if name == "TPP2":
            p0, p1 = rng.choice("XYZ"), rng.choice("XYZ")
            lines.append(f"TPP {p0}{targets[0]}*{p1}{targets[1]}")
        elif name == "R_PAULI2":
            p0, p1 = rng.choice("XYZ"), rng.choice("XYZ")
            lines.append(f"R_PAULI(0.27) {p0}{targets[0]}*{p1}{targets[1]}")
        else:
            lines.append(f"{name} {' '.join(map(str, targets))}")
    if include_measurements:
        lines.append("M " + " ".join(str(q) for q in range(qubits)))
    return "\n".join(lines)
