"""Rotated surface code memory circuit generator.

Generates memory-Z experiments on the rotated [[d^2, 1, d]] surface code
(equivalent workload family to ``stim.Circuit.generated("surface_code:
rotated_memory_z")`` used by the reference benchmarks). Layout: d x d data
grid; interior 4-body plaquettes on a checkerboard (Z when (i+j) even),
X-type 2-body half-plaquettes on the top/bottom boundary, Z-type on
left/right. Logical Z = top row. Detector determinism is verified against
the statevector oracle in tests.
"""

from __future__ import annotations

from ..circuit import Circuit


def _build_stabilizers(d: int):
    """Returns (z_stabs, x_stabs): lists of data-qubit (i, j) tuples."""
    z_stabs: list[list[tuple[int, int]]] = []
    x_stabs: list[list[tuple[int, int]]] = []
    for i in range(d - 1):
        for j in range(d - 1):
            quad = [(i, j), (i, j + 1), (i + 1, j), (i + 1, j + 1)]
            (z_stabs if (i + j) % 2 == 0 else x_stabs).append(quad)
    for j in range(d - 1):  # top (i = -1) and bottom (i = d-1) X boundaries
        if (-1 + j) % 2 == 1:
            x_stabs.append([(0, j), (0, j + 1)])
        if (d - 1 + j) % 2 == 1:
            x_stabs.append([(d - 1, j), (d - 1, j + 1)])
    for i in range(d - 1):  # left (j = -1) and right (j = d-1) Z boundaries
        if (i - 1) % 2 == 0:
            z_stabs.append([(i, 0), (i + 1, 0)])
        if (i + d - 1) % 2 == 0:
            z_stabs.append([(i, d - 1), (i + 1, d - 1)])
    return z_stabs, x_stabs


def rotated_surface_code_memory_z(
    distance: int,
    rounds: int,
    *,
    after_clifford_depolarization: float = 0.0,
    before_round_data_depolarization: float = 0.0,
    before_measure_flip_probability: float = 0.0,
    after_reset_flip_probability: float = 0.0,
) -> Circuit:
    """Memory-Z experiment: reset, ``rounds`` stabilizer rounds, data readout."""
    d = distance
    if d < 2 or rounds < 1:
        raise ValueError("distance >= 2 and rounds >= 1 required")
    z_stabs, x_stabs = _build_stabilizers(d)
    data_index = {(i, j): i * d + j for i in range(d) for j in range(d)}
    n_data = d * d
    z_anc = {k: n_data + k for k in range(len(z_stabs))}
    x_anc = {k: n_data + len(z_stabs) + k for k in range(len(x_stabs))}
    n_anc = len(z_stabs) + len(x_stabs)

    p_cx = after_clifford_depolarization
    p_data = before_round_data_depolarization
    p_m = before_measure_flip_probability
    p_r = after_reset_flip_probability

    lines: list[str] = []
    all_data = " ".join(str(q) for q in range(n_data))
    all_anc = " ".join(str(n_data + a) for a in range(n_anc))
    x_anc_str = " ".join(str(x_anc[k]) for k in range(len(x_stabs)))

    lines.append(f"R {all_data} {all_anc}")
    if p_r:
        lines.append(f"X_ERROR({p_r}) {all_data} {all_anc}")
    lines.append("TICK")

    # Interaction schedule: each stabilizer touches its data qubits in a
    # fixed local order over 4 steps (2 steps for boundary stabilizers).
    def _round(first: bool) -> None:
        if p_data:
            lines.append(f"DEPOLARIZE1({p_data}) {all_data}")
        lines.append(f"H {x_anc_str}")
        if p_cx:
            lines.append(f"DEPOLARIZE1({p_cx}) {x_anc_str}")
        lines.append("TICK")
        for step in range(4):
            pairs = []
            for k, quad in enumerate(z_stabs):
                if step < len(quad):
                    dq = data_index[quad[step]]
                    pairs.append((dq, z_anc[k]))  # data controls Z-ancilla
            for k, quad in enumerate(x_stabs):
                if step < len(quad):
                    dq = data_index[quad[step]]
                    pairs.append((x_anc[k], dq))  # X-ancilla controls data
            if not pairs:
                continue
            tgt = " ".join(f"{a} {b}" for a, b in pairs)
            lines.append(f"CX {tgt}")
            if p_cx:
                lines.append(f"DEPOLARIZE2({p_cx}) {tgt}")
            lines.append("TICK")
        lines.append(f"H {x_anc_str}")
        if p_cx:
            lines.append(f"DEPOLARIZE1({p_cx}) {x_anc_str}")
        lines.append("TICK")
        if p_m:
            lines.append(f"X_ERROR({p_m}) {all_anc}")
        lines.append(f"MR {all_anc}")
        if p_r:
            lines.append(f"X_ERROR({p_r}) {all_anc}")
        # Detectors: ancillas were measured in order z..., x...
        for k in range(len(z_stabs)):
            back = -(n_anc - k)
            if first:
                lines.append(f"DETECTOR rec[{back}]")
            else:
                lines.append(f"DETECTOR rec[{back}] rec[{back - n_anc}]")
        if not first:
            for k in range(len(x_stabs)):
                back = -(len(x_stabs) - k)
                lines.append(f"DETECTOR rec[{back}] rec[{back - n_anc}]")

    _round(first=True)
    for _ in range(rounds - 1):
        _round(first=False)

    if p_m:
        lines.append(f"X_ERROR({p_m}) {all_data}")
    lines.append(f"M {all_data}")
    # Final Z-stabilizer detectors: data rec bits + last Z-ancilla rec.
    for k, quad in enumerate(z_stabs):
        recs = [-(n_data - data_index[q]) for q in quad]
        anc_back = -(n_data + n_anc - k)
        recs_s = " ".join(f"rec[{r}]" for r in recs)
        lines.append(f"DETECTOR {recs_s} rec[{anc_back}]")
    obs = " ".join(f"rec[{-(n_data - data_index[(0, j)])}]" for j in range(d))
    lines.append(f"OBSERVABLE_INCLUDE(0) {obs}")

    return Circuit("\n".join(lines))
