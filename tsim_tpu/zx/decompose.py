"""Stabilizer-rank decomposition of non-Clifford ZX diagrams.

Splits a diagram with magic (pi/4-multiple) and arbitrary-angle phases into
a sum of Clifford diagrams. Strategies (same names as the reference API,
reference ``tsim/compile/stabrank.py``):

* ``cutting``: single-vertex 2-way cuts (chi = 2^T).
* ``bss``: T-pair decomposition: two magic phases -> 2 terms via an
  equality/anti-equality hub split (chi = 2^(T/2)); derived from
  w^(x1+x2) = [x1=x2] i^(x1) + w [x1 != x2], oracle-verified.
* ``cat5``: pair strategy with gadget-leaf cuts preferred (leaves vanish
  immediately under reduction).

All decompositions are exact: coefficients are dyadic elements of Z[w].
"""

from __future__ import annotations

import cmath
import math
from fractions import Fraction

from .graph import HADAMARD, SIMPLE, X, Z, ZXGraph
from .scalar import ExactDyadic, omega_pow_dyadic


class GraphSum:
    def __init__(self, graphs: list[ZXGraph]):
        self.graphs = graphs


def _effective_denominator(g: ZXGraph, v: int) -> int:
    return g.phase(v).denominator


def tcount(g: ZXGraph) -> int:
    """Number of vertices whose constant phase is an odd multiple of pi/4."""
    return sum(1 for v in g.vertices() if _effective_denominator(g, v) == 4)


def u3_count(g: ZXGraph) -> int:
    """Number of vertices with non-Clifford+T (arbitrary-angle) phases."""
    return sum(1 for v in g.vertices() if _effective_denominator(g, v) not in (1, 2, 4))


def _t_vertices(g: ZXGraph) -> list[int]:
    return [v for v in g.vertices() if _effective_denominator(g, v) == 4]


def _is_gadget_leaf(g: ZXGraph, v: int) -> bool:
    if g.degree(v) != 1:
        return False
    (h,) = g.neighbors(v)
    return g.type(h) == Z and g.degree(h) >= 2


def cut_vertex(g: ZXGraph, v: int) -> GraphSum:
    """Split on the constant phase of ``v``:

    Z_n(a + pi P) = (1+e^{ia})/2 * Z_n(pi P)  +  (1-e^{ia})/2 * Z_n(pi + pi P)

    Exact for dyadic ``a``; arbitrary angles use the approximate float factor.
    """
    a = g.phase(v)
    g0 = g.copy()
    g1 = g.copy()
    g0.set_phase(v, 0)
    g1.set_phase(v, 1)
    if a.denominator in (1, 2, 4):
        k = int(a * 4) % 8
        wk = omega_pow_dyadic(k)
        # (1 + w^k)/2 and (1 - w^k)/2 with the /2 as power2 -= 2 each.
        g0.scalar.mul_dyadic(ExactDyadic(wk.a + 1, wk.b, wk.c, wk.d))
        g0.scalar.add_power(-2)
        g1.scalar.mul_dyadic(ExactDyadic(1 - wk.a, -wk.b, -wk.c, -wk.d))
        g1.scalar.add_power(-2)
    else:
        z = cmath.exp(1j * math.pi * float(a))
        g0.scalar.mul_float((1 + z) / 2)
        g1.scalar.mul_float((1 - z) / 2)
    return GraphSum([g0, g1])


def split_t_pair(g: ZXGraph, v1: int, v2: int) -> GraphSum:
    """Remove one pi/4 from each of two magic vertices using

        w^{x1+x2} = [x1 = x2] * i^{x1}  +  w * [x1 != x2]

    Term A adds an equality hub Z(pi/2) simple-connected to both vertices;
    term B adds an anti-equality hub (Z(0) hub with an X(pi) NOT spider on
    the second arm) and scalar w. Oracle-verified in tests/unit/zx.
    """
    gA = g.copy()
    gA.add_to_phase(v1, Fraction(-1, 4))
    gA.add_to_phase(v2, Fraction(-1, 4))
    hub = gA.add_vertex(Z, qubit=g.qubit(v1), row=(g.row(v1) + g.row(v2)) / 2,
                        phase=Fraction(1, 2))
    gA.add_edge((hub, v1), SIMPLE)
    gA.add_edge((hub, v2), SIMPLE)

    gB = g.copy()
    gB.add_to_phase(v1, Fraction(-1, 4))
    gB.add_to_phase(v2, Fraction(-1, 4))
    hub = gB.add_vertex(Z, qubit=g.qubit(v1), row=(g.row(v1) + g.row(v2)) / 2)
    notv = gB.add_vertex(X, qubit=g.qubit(v2), row=g.row(v2), phase=Fraction(1))
    gB.add_edge((hub, v1), SIMPLE)
    gB.add_edge((hub, notv), SIMPLE)
    gB.add_edge((notv, v2), SIMPLE)
    gB.scalar.add_phase(Fraction(1, 4))
    return GraphSum([gA, gB])


def replace_magic_states(
    g: ZXGraph, pick_random: bool = False, strategy: str = "cat5"
) -> GraphSum:
    """One decomposition step on magic (pi/4) phases; caller recurses."""
    ts = _t_vertices(g)
    if not ts:
        return GraphSum([g])
    if strategy == "cutting":
        return cut_vertex(g, ts[0])
    # cat5/bss: prefer cutting gadget leaves (they immediately disappear),
    # then pair up remaining magic vertices; a lone remainder is cut.
    if strategy == "cat5":
        leaves = [v for v in ts if _is_gadget_leaf(g, v)]
        if leaves:
            return cut_vertex(g, leaves[0])
    if len(ts) >= 2:
        return split_t_pair(g, ts[0], ts[1])
    return cut_vertex(g, ts[0])


def replace_u3_states(g: ZXGraph, strategy: str = "cat5") -> GraphSum:
    """One decomposition step on an arbitrary-angle phase vertex."""
    for v in g.vertices():
        if _effective_denominator(g, v) not in (1, 2, 4):
            return cut_vertex(g, v)
    return GraphSum([g])
