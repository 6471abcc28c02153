"""Recursive stabilizer-rank decomposition driver.

Control flow mirrors reference ``tsim/compile/stabrank.py``: reduce, strip
arbitrary-angle (U3) phases, then decompose magic phases, re-reducing and
dropping zero-scalar children at every step.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from ..zx.decompose import replace_magic_states, replace_u3_states, tcount, u3_count
from ..zx.graph import ZXGraph
from ..zx.simplify import full_reduce


def _decompose(graphs: Sequence[ZXGraph], count_fn, replace_fn) -> list[ZXGraph]:
    results: list[ZXGraph] = []
    stack = list(graphs)[::-1]
    while stack:
        graph = stack.pop()
        if count_fn(graph) == 0:
            results.append(graph)
            continue
        gsum = replace_fn(graph.copy())
        for g in gsum.graphs:
            full_reduce(g, paramSafe=True)
            if g.scalar.is_zero:
                continue
            stack.append(g)
    return results


def find_stab_magic(graphs: Iterable[ZXGraph], strategy: str) -> list[ZXGraph]:
    return _decompose(
        list(graphs),
        count_fn=tcount,
        replace_fn=lambda g: replace_magic_states(g, pick_random=False, strategy=strategy),
    )


def find_stab_u3(graphs: Iterable[ZXGraph], strategy: str) -> list[ZXGraph]:
    return _decompose(
        list(graphs),
        count_fn=u3_count,
        replace_fn=lambda g: replace_u3_states(g, strategy=strategy),
    )


def _scalar_signature(g: ZXGraph):
    """Canonical key of a scalar graph's *symbolic* (param-dependent) part."""
    s = g.scalar
    nodes = tuple(
        sorted(
            (str(p), tuple(sorted(v)))
            for p, v in zip(s.phasenodes, s.phasenodevars)
        )
    )
    halfpi = tuple(
        sorted(
            (j, tuple(sorted(tuple(sorted(vs)) for vs in lst)))
            for j, lst in s.phasevars_halfpi.items()
            if lst
        )
    )
    pipairs = tuple(
        sorted(
            tuple(sorted((tuple(sorted(psi)), tuple(sorted(phi)))))
            for psi, phi in s.phasevars_pi_pair
        )
    )
    pairs = tuple(
        sorted(
            tuple(
                sorted(
                    [
                        (pp.alpha, tuple(sorted(pp.paramsA))),
                        (pp.beta, tuple(sorted(pp.paramsB))),
                    ]
                )
            )
            for pp in s.phasepairs
        )
    )
    return (nodes, halfpi, pipairs, pairs, tuple(sorted(s.phasevars_pi)))


def merge_parallel_graphs(graphs: list[ZXGraph]) -> list[ZXGraph]:
    """Merge scalar graphs whose symbolic parts coincide by summing their
    constant prefactors (exactly in Z[w]*sqrt(2)^p when possible).

    Decomposition branches frequently differ only in pulled constants; a
    merged sum keeps term counts (the kernel's G axis) at the number of
    *distinct* parameter dependencies. Graphs whose merged constant is
    exactly zero are dropped.
    """
    import cmath
    import math

    from ..zx.scalar import ExactDyadic

    groups: dict = {}
    order: list = []
    for g in graphs:
        if g.num_vertices() != 0 or g.scalar.is_zero:
            # Only fully-contracted graphs participate; leave others alone.
            key = ("__opaque__", id(g))
        else:
            key = _scalar_signature(g)
        if key not in groups:
            groups[key] = [g]
            order.append(key)
        else:
            groups[key].append(g)

    out: list[ZXGraph] = []
    for key in order:
        members = groups[key]
        if len(members) == 1 or key[0] == "__opaque__":
            out.extend(members)
            continue
        exact = all(
            abs(complex(m.scalar.approximate_floatfactor) - 1.0) < 1e-15
            and m.scalar.phase.denominator in (1, 2, 4)
            for m in members
        )
        base = members[0]
        s0 = base.scalar
        if exact:
            p_min = min(m.scalar.power2 for m in members)
            total = ExactDyadic(0, 0, 0, 0)
            for m in members:
                s = m.scalar
                d = s.floatfactor.mul_omega_pow(int(s.phase * 4) % 8)
                dp = s.power2 - p_min
                if dp % 2:
                    d = d * ExactDyadic(0, 1, 0, -1)  # sqrt(2)
                    dp -= 1
                shift = 1 << (dp // 2)
                d = ExactDyadic(d.a * shift, d.b * shift, d.c * shift, d.d * shift)
                total = ExactDyadic(
                    total.a + d.a, total.b + d.b, total.c + d.c, total.d + d.d
                )
            if total.is_zero():
                continue
            s0.power2 = p_min
            s0.phase = type(s0.phase)(0)
            s0.floatfactor = total
            s0.approximate_floatfactor = 1.0
        else:
            scale = max(
                abs(
                    2.0 ** (m.scalar.power2 / 2.0)
                    * abs(m.scalar.floatfactor.to_complex())
                    * abs(complex(m.scalar.approximate_floatfactor))
                )
                for m in members
            )
            total_c = 0j
            for m in members:
                s = m.scalar
                total_c += (
                    2.0 ** (s.power2 / 2.0)
                    * cmath.exp(1j * math.pi * float(s.phase))
                    * s.floatfactor.to_complex()
                    * complex(s.approximate_floatfactor)
                )
            if scale > 0 and abs(total_c) / scale < 1e-14:
                continue
            s0.power2 = 0
            s0.phase = type(s0.phase)(0)
            s0.floatfactor = ExactDyadic(1, 0, 0, 0)
            s0.approximate_floatfactor = total_c
        out.append(base)
    return out


def find_stab(graph: ZXGraph, strategy: str) -> list[ZXGraph]:
    """Decompose into a sum of Clifford (stabilizer) scalar graphs."""
    full_reduce(graph, paramSafe=True)
    graphs = find_stab_u3([graph], strategy=strategy)
    return merge_parallel_graphs(find_stab_magic(graphs, strategy=strategy))
