"""Calibrate gadget fusion scalar + verify unfuse_to_gadget exactness."""
import itertools
import sys
from fractions import Fraction

sys.path.insert(0, "/root/repo")
import numpy as np

from tsim_tpu.zx.graph import HADAMARD, Z, ZXGraph
from tsim_tpu.zx import simplify
from tsim_tpu.zx.tensor import graph_to_tensor
from dev.calibrate_rules import fit_ratio

rng = np.random.default_rng(0)

print("=== unfuse_to_gadget ===")
for trial in range(5):
    g = ZXGraph()
    v = g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4))
    others = [g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4)) for _ in range(3)]
    for o in others:
        g.add_edge((v, o), HADAMARD)
    t0 = graph_to_tensor(g)
    g2 = g.copy()
    simplify.unfuse_to_gadget(g2, v)
    t1 = graph_to_tensor(g2)
    print("  exact:", np.allclose(np.asarray(t0), np.asarray(t1)))

print("=== gadget fusion ===")
for k in range(1, 5):
    results = set()
    for trial in range(3):
        g = ZXGraph()
        targets = [g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4)) for _ in range(k)]
        # spectators so targets aren't terminal
        for t in targets:
            w = g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4))
            g.add_edge((t, w), HADAMARD)
        hubs = []
        for i in range(2):
            hub = g.add_vertex(Z)
            leaf = g.add_vertex(Z, phase=Fraction(rng.integers(0, 8), 4))
            g.add_edge((hub, leaf), HADAMARD)
            for t in targets:
                g.add_edge((hub, t), HADAMARD)
            hubs.append((hub, leaf))
        t0 = graph_to_tensor(g)
        g2 = g.copy()
        ch = simplify.gadget_simp(g2)
        assert ch, "gadget_simp did not fire"
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
    print(f"  k={k}: correction needed = {results}")
