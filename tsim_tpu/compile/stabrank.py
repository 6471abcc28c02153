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


def find_stab(graph: ZXGraph, strategy: str) -> list[ZXGraph]:
    """Decompose into a sum of Clifford (stabilizer) scalar graphs."""
    full_reduce(graph, paramSafe=True)
    graphs = find_stab_u3([graph], strategy=strategy)
    return find_stab_magic(graphs, strategy=strategy)
