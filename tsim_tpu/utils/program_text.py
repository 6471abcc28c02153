"""tsim shorthand <-> Stim-dialect program text conversion.

Same rewrite table as reference ``tsim/utils/program_text.py``: T/TPP/R_*/U3
and CCZ/CCX shorthand become tagged Stim instructions and back.
"""

from __future__ import annotations

import re
from collections.abc import Callable

from ..core.tags import decode_t_user_tag, encode_t_tag

FLOAT_RE = r"[-+]?(?:\d+\.?\d*|\.\d+)(?:[eE][-+]?\d+)?"

_TSIM_GATES = {
    "CCZ", "CCX", "R_X", "R_Y", "R_Z", "R_XX", "R_YY", "R_ZZ", "R_PAULI", "U3",
}
_GATE_NOT_FOUND_RE = re.compile(r"Gate not found: '(\w+)'")
_GATE_USAGE_RE = re.compile(
    r"(?<!\[)\b(CCZ\b|CCX\b|R_PAULI\([^)]*\)|R_[XYZ]{1,2}\([^)]*\)|R_[XYZ]\b|U3\([^)]*\)|U3\b)"
)


def controlled_gate_decomposition_lines(
    gate: str,
    control1,
    control2,
    target,
    *,
    tag: str = "",
) -> list[str]:
    """Clifford+T decomposition of CCZ / CCX."""
    if gate not in ("CCZ", "CCX"):
        raise ValueError(f"Unsupported controlled-controlled gate: {gate!r}")

    def tg(name: str) -> str:
        return f"{name}[{tag}]" if tag else name

    a, b, c = str(control1), str(control2), str(target)
    ccz = [
        f"{tg('CNOT')} {b} {c}",
        f"{tg('T_DAG')} {c}",
        f"{tg('CNOT')} {a} {c}",
        f"{tg('T')} {c}",
        f"{tg('CNOT')} {b} {c}",
        f"{tg('T_DAG')} {c}",
        f"{tg('CNOT')} {a} {c}",
        f"{tg('T')} {b}",
        f"{tg('T')} {c}",
        f"{tg('CNOT')} {a} {b}",
        f"{tg('T')} {a}",
        f"{tg('T_DAG')} {b}",
        f"{tg('CNOT')} {a} {b}",
    ]
    if gate == "CCZ":
        return ccz
    return [f"{tg('H')} {c}", *ccz, f"{tg('H')} {c}"]


def _expand_controlled_gates(text: str) -> str:
    lines: list[str] = []
    for line in text.splitlines():
        body, sep, comment = line.partition("#")
        m = re.match(r"^(\s*)(CCZ|CCX)(?:\[([^\]\n]*)\])?\s+(.+?)\s*$", body)
        if not m:
            lines.append(line)
            continue
        indent, gate, tag, targets_text = m.groups()
        targets = targets_text.split()
        if len(targets) % 3 != 0 or not all(t.isdecimal() for t in targets):
            raise ValueError(
                f"{gate} expects bare qubit integer targets in groups of three."
            )
        if sep:
            lines.append(f"{indent}{sep}{comment}")
        for i in range(0, len(targets), 3):
            lines.extend(
                f"{indent}{dl}"
                for dl in controlled_gate_decomposition_lines(
                    gate, targets[i], targets[i + 1], targets[i + 2], tag=tag or ""
                )
            )
    return "\n".join(lines)


def _replace_t_family(stim_gate: str) -> Callable:
    def replace(m: re.Match) -> str:
        return f"{stim_gate}[{encode_t_tag(m.group(1) or '')}]"

    return replace


def _replace_t_family_shorthand(tsim_gate: str) -> Callable:
    def replace(m: re.Match) -> str:
        user_tag = decode_t_user_tag(m.group(1))
        return f"{tsim_gate}[{user_tag}]" if user_tag else tsim_gate

    return replace


def enriched_stim_error(exc: ValueError, converted_text: str) -> ValueError:
    m = _GATE_NOT_FOUND_RE.search(str(exc))
    if not m or m.group(1) not in _TSIM_GATES:
        return exc
    usage = _GATE_USAGE_RE.search(converted_text)
    if not usage:
        return exc
    return ValueError(f"Could not parse '{usage.group()}' in program text.")


def format_angle(x) -> str:
    """Display form of an angle (units of pi) parsed into a canonical dyadic.

    Angles canonicalize to 2^-40 resolution at parse time
    (``core.parse.canonical_angle``); 12 significant digits collapse the
    dyadic back to the user's decimal (0.300000000000182 -> "0.3"), and
    re-parsing the display form recovers the identical canonical dyadic for
    any user input with at most 12 significant digits.
    """
    return f"{float(x):.12g}"


def shorthand_to_stim(text: str) -> str:
    """Convert tsim shorthand to valid Stim-dialect instructions."""
    text = _expand_controlled_gates(text)

    text = re.sub(
        r"(?<!\[)\bTPP_DAG(?:\[([^\]\n]*)\])?(?!\w)", _replace_t_family("SPP_DAG"), text
    )
    text = re.sub(
        r"(?<!\[)\bTPP(?:\[([^\]\n]*)\])?(?!\w)", _replace_t_family("SPP"), text
    )
    text = re.sub(
        r"(?<!\[)\bT_DAG(?:\[([^\]\n]*)\])?(?!\w)", _replace_t_family("S_DAG"), text
    )
    text = re.sub(r"(?<!\[)\bT(?:\[([^\]\n]*)\])?(?!\w)", _replace_t_family("S"), text)

    def replace_pauli_pair(m: re.Match) -> str:
        pauli = m.group(1)
        alpha = float(m.group(2))
        q0, q1 = m.group(3), m.group(4)
        if q0 == q1:
            raise ValueError(
                f"R_{pauli}{pauli} target qubits must be distinct, got {q0} {q1}."
            )
        return f"SPP[R_PAULI(theta={alpha}*pi)] {pauli}{q0}*{pauli}{q1}"

    text = re.sub(
        rf"\bR_([XYZ])\1\(({FLOAT_RE})\)\s+(\d+)\s+(\d+)", replace_pauli_pair, text
    )

    def replace_pauli(m: re.Match) -> str:
        return f"SPP[R_PAULI(theta={float(m.group(1))}*pi)] {m.group(2)}"

    text = re.sub(
        rf"\bR_PAULI\(({FLOAT_RE})\)\s+((?:[XYZ]\d+)(?:\*[XYZ]\d+)*)",
        replace_pauli,
        text,
    )

    def replace_rotation(m: re.Match) -> str:
        return f"I[R_{m.group(1)}(theta={float(m.group(2))}*pi)]"

    text = re.sub(rf"\bR_([XYZ])\(({FLOAT_RE})\)", replace_rotation, text)

    def replace_u3(m: re.Match) -> str:
        theta, phi, lam = float(m.group(1)), float(m.group(2)), float(m.group(3))
        return f"I[U3(theta={theta}*pi, phi={phi}*pi, lambda={lam}*pi)]"

    text = re.sub(
        rf"\bU3\(({FLOAT_RE})\s*,\s*({FLOAT_RE})\s*,\s*({FLOAT_RE})\)", replace_u3, text
    )

    def canonicalize(m: re.Match) -> str:
        return f"{m.group(1)}={float(m.group(2))}*pi"

    text = re.sub(rf"\b(theta|phi|lambda)=({FLOAT_RE})\*pi", canonicalize, text)
    return text


def stim_to_shorthand(text: str) -> str:
    """Convert expanded Stim annotations back to tsim shorthand."""

    def replace_u3(m: re.Match) -> str:
        return f"U3({m.group(1)}, {m.group(2)}, {m.group(3)})"

    text = re.sub(
        rf"\bI\[U3\(theta=({FLOAT_RE})\*pi, phi=({FLOAT_RE})\*pi, lambda=({FLOAT_RE})\*pi\)\]",
        replace_u3,
        text,
    )

    def replace_pauli_pair(m: re.Match) -> str:
        return f"R_{m.group(2)}{m.group(2)}({m.group(1)}) {m.group(3)} {m.group(4)}"

    text = re.sub(
        rf"\bSPP\[R_PAULI\(theta=({FLOAT_RE})\*pi\)\] ([XYZ])(\d+)\*\2(\d+)(?!\*)\b",
        replace_pauli_pair,
        text,
    )

    def replace_pauli(m: re.Match) -> str:
        return f"R_PAULI({m.group(1)}) {m.group(2)}"

    text = re.sub(
        rf"\bSPP\[R_PAULI\(theta=({FLOAT_RE})\*pi\)\] ((?:[XYZ]\d+)(?:\*[XYZ]\d+)*)",
        replace_pauli,
        text,
    )

    def replace_rotation(m: re.Match) -> str:
        return f"R_{m.group(1)}({m.group(2)})"

    text = re.sub(
        rf"\bI\[R_([XYZ])\(theta=({FLOAT_RE})\*pi\)\]", replace_rotation, text
    )

    text = re.sub(
        r"(?<!\w)SPP_DAG\[(T(?::[^\]\n]*)?)\](?!\w)",
        _replace_t_family_shorthand("TPP_DAG"),
        text,
    )
    text = re.sub(
        r"(?<!\w)SPP\[(T(?::[^\]\n]*)?)\](?!\w)",
        _replace_t_family_shorthand("TPP"),
        text,
    )
    text = re.sub(
        r"(?<!\w)S_DAG\[(T(?::[^\]\n]*)?)\](?!\w)",
        _replace_t_family_shorthand("T_DAG"),
        text,
    )
    text = re.sub(
        r"(?<!\w)S\[(T(?::[^\]\n]*)?)\](?!\w)",
        _replace_t_family_shorthand("T"),
        text,
    )
    return text
