"""Calibrate/verify base scalars of lcomp and pivot against the tensor oracle.

Builds small graphs, applies the rule, and measures the complex ratio
oracle_before / oracle_after_without_base so the base scalar can be fitted
as sqrt(2)^k * omega^j. Run: python dev/calibrate_rules.py
"""
import cmath
import itertools
import math
import sys
from fractions import Fraction

sys.path.insert(0, "/root/repo")
import numpy as np

from tsim_tpu.zx.graph import HADAMARD, SIMPLE, Z, ZXGraph
from tsim_tpu.zx import rules
from tsim_tpu.zx.tensor import graph_to_tensor


def build_lcomp_case(n, s, rng):
    """u with phase s/2 connected to n interior spiders (random extra edges)."""
    g = ZXGraph()
    u = g.add_vertex(Z, phase=Fraction(s, 2))
    nbrs = [g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4)) for _ in range(n)]
    for v in nbrs:
        g.add_edge((u, v), HADAMARD)
    # random edges among neighbors
    for a, b in itertools.combinations(nbrs, 2):
        if rng.random() < 0.4:
            g.add_edge((a, b), HADAMARD)
    # extra spectator spiders attached to neighbors so they aren't terminal
    for v in nbrs:
        w = g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4))
        g.add_edge((v, w), HADAMARD)
    return g, u


def fit_ratio(r):
    """Express complex r as sqrt(2)^k * e^{i pi m/4}; return (k, m) or None."""
    mag = abs(r)
    if mag < 1e-12:
        return None
    k = round(2 * math.log2(mag))
    ang = cmath.phase(r) / (math.pi / 4)
    m = round(ang) % 8
    approx = 2 ** (k / 2) * cmath.exp(1j * math.pi * m / 4)
    if abs(approx - r) < 1e-8 * max(1, abs(r)):
        return k, m
    return None


def calibrate_lcomp():
    rng = np.random.default_rng(0)
    print("=== lcomp ===")
    for s in (1, -1):
        for n in range(0, 6):
            results = set()
            for trial in range(4):
                g, u = build_lcomp_case(n, s, rng)
                t0 = graph_to_tensor(g)
                g2 = g.copy()
                rules.lcomp(g2, u)
                t1 = graph_to_tensor(g2)
                nz = np.abs(t0) > 1e-9
                if not nz.any():
                    continue
                ratio = (np.asarray(t0)[nz] / np.asarray(t1)[nz]).ravel()
                if np.allclose(ratio, ratio[0], atol=1e-8):
                    results.add(fit_ratio(complex(ratio[0])))
                else:
                    results.add("STRUCTURE-MISMATCH")
            print(f"  s={s:+d} n={n}: correction needed (k_extra, m_extra) = {results}")


def build_pivot_case(na, nb, nc, a0, b0, rng):
    g = ZXGraph()
    u = g.add_vertex(Z, phase=Fraction(a0))
    v = g.add_vertex(Z, phase=Fraction(b0))
    g.add_edge((u, v), HADAMARD)
    A = [g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4)) for _ in range(na)]
    B = [g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4)) for _ in range(nb)]
    C = [g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4)) for _ in range(nc)]
    for x in A:
        g.add_edge((u, x), HADAMARD)
    for x in B:
        g.add_edge((v, x), HADAMARD)
    for x in C:
        g.add_edge((u, x), HADAMARD)
        g.add_edge((v, x), HADAMARD)
    for x, y in itertools.combinations(A + B + C, 2):
        if rng.random() < 0.3:
            g.add_edge((x, y), HADAMARD)
    for x in A + B + C:
        w = g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4))
        g.add_edge((x, w), HADAMARD)
    return g, u, v


def calibrate_pivot():
    rng = np.random.default_rng(1)
    print("=== pivot ===")
    bad = 0
    for na, nb, nc in itertools.product(range(0, 3), repeat=3):
        for a0, b0 in itertools.product((0, 1), repeat=2):
            results = set()
            for trial in range(3):
                g, u, v = build_pivot_case(na, nb, nc, a0, b0, rng)
                t0 = graph_to_tensor(g)
                g2 = g.copy()
                rules.pivot(g2, u, v)
                t1 = graph_to_tensor(g2)
                nz = np.abs(np.asarray(t0)) > 1e-9
                if not nz.any():
                    results.add("ZERO")
                    continue
                ratio = (np.asarray(t0)[nz] / np.asarray(t1)[nz]).ravel()
                if np.allclose(ratio, ratio[0], atol=1e-8):
                    results.add(fit_ratio(complex(ratio[0])))
                else:
                    results.add("STRUCTURE-MISMATCH")
            if results != {(0, 0)}:
                bad += 1
                print(f"  na={na} nb={nb} nc={nc} a0={a0} b0={b0}: {results}")
    if bad == 0:
        print("  all exact (correction (0,0))")


if __name__ == "__main__":
    calibrate_lcomp()
    calibrate_pivot()
