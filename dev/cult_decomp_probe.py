"""Experiment harness: decomposition variants on the cultivation circuit.

Builds the full-plugged cultivation component once, then runs find_stab
under different pair-selection policies. Usage:
    JAX_PLATFORMS=cpu python dev/cult_decomp_probe.py [policy ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from tsim_tpu.core.graph_prep import connected_components, prepare_graph
from tsim_tpu.compile.pipeline import _plug_outputs
from tsim_tpu.compile.stabrank import find_stab
from tsim_tpu.models.cultivation import cultivation_d3
from tsim_tpu.zx.simplify import set_shake
from tsim_tpu.zx import decompose as dc


def build():
    c = cultivation_d3(p=0.001)
    prepared = prepare_graph(c, sample_detectors=True)
    cc = max(connected_components(prepared.graph), key=lambda x: x.graph.num_vertices())
    m_chars = [f"m{i}" for i in cc.output_indices]
    return _plug_outputs(cc.graph, m_chars, [len(cc.graph.outputs())])[0]


def run(g, tag):
    set_shake(False)
    t0 = time.perf_counter()
    gl = find_stab(g.copy(), strategy="cat5")
    print(f"{tag}: terms={len(gl)} {time.perf_counter() - t0:.0f}s", flush=True)


POLICIES = {}


def policy(name):
    def deco(f):
        POLICIES[name] = f
        return f
    return deco


_orig_find = dc._find_projector_gadget_pair


@policy("baseline")
def p_baseline():
    dc._find_projector_gadget_pair = _orig_find


@policy("min_symdiff")
def p_min_symdiff():
    def find(g, ts, strict=True):
        best = None
        gadgets = _gadgets(g, ts)
        for i, (l1, h1, t1) in enumerate(gadgets):
            for l2, h2, t2 in gadgets[i + 1 :]:
                ok, conj, eqp = _pair_ok(g, l1, h1, t1, l2, h2, t2, strict)
                if not ok:
                    continue
                score = (-len(t1 ^ t2), eqp, conj, len(t1 & t2))
                if best is None or score > best[0]:
                    best = (score, l1, h1, l2, h2)
        return None if best is None else best[1:]

    dc._find_projector_gadget_pair = find


@policy("lookahead")
def p_lookahead():
    from tsim_tpu.zx.simplify import full_reduce
    from tsim_tpu.zx.decompose import split_gadget_pair_projector, tcount

    def find(g, ts, strict=True):
        gadgets = _gadgets(g, ts)
        cands = []
        for i, (l1, h1, t1) in enumerate(gadgets):
            for l2, h2, t2 in gadgets[i + 1 :]:
                ok, conj, eqp = _pair_ok(g, l1, h1, t1, l2, h2, t2, strict)
                if not ok:
                    continue
                static = (2000 if eqp else 0) + (1000 if conj else 0) + 10 * len(t1 & t2) - len(t1 ^ t2)
                cands.append((static, l1, h1, l2, h2))
        if not cands:
            return None
        cands.sort(reverse=True)
        top = cands[:4]
        if len(top) == 1 or tcount(g) < 8:
            return top[0][1:]
        best = None
        for static, l1, h1, l2, h2 in top:
            gs = split_gadget_pair_projector(g.copy(), l1, h1, l2, h2)
            cost = 0.0
            for child in gs.graphs:
                full_reduce(child, paramSafe=True)
                if child.scalar.is_zero:
                    continue
                cost += 2.0 ** (tcount(child) / 2.0)
            key = (cost, -static)
            if best is None or key < best[0]:
                best = (key, l1, h1, l2, h2)
        return best[1:]

    dc._find_projector_gadget_pair = find


@policy("greedy_full")
def p_greedy_full():
    from tsim_tpu.zx.simplify import full_reduce
    from tsim_tpu.zx.decompose import split_gadget_pair_projector, tcount

    def find(g, ts, strict=True):
        gadgets = _gadgets(g, ts)
        cands = []
        for i, (l1, h1, t1) in enumerate(gadgets):
            for l2, h2, t2 in gadgets[i + 1 :]:
                ok, conj, eqp = _pair_ok(g, l1, h1, t1, l2, h2, t2, strict)
                if not ok:
                    continue
                static = (2000 if eqp else 0) + (1000 if conj else 0) + 10 * len(t1 & t2) - len(t1 ^ t2)
                cands.append((static, l1, h1, l2, h2))
        if not cands:
            return None
        cands.sort(reverse=True)
        best = None
        for static, l1, h1, l2, h2 in cands:
            gs = split_gadget_pair_projector(g.copy(), l1, h1, l2, h2)
            cost = 0.0
            for child in gs.graphs:
                full_reduce(child, paramSafe=True)
                if child.scalar.is_zero:
                    continue
                cost += 2.0 ** (tcount(child) / 2.0)
            key = (cost, -static)
            if best is None or key < best[0]:
                best = (key, l1, h1, l2, h2)
        return best[1:]

    dc._find_projector_gadget_pair = find


def _gadgets(g, ts):
    from tsim_tpu.zx.decompose import _all_h
    out = []
    for v in ts:
        if g.degree(v) != 1 or not _all_h(g, v):
            continue
        (h,) = g.neighbors(v)
        if g.type(h) != 1 or g.phase(h) != 0 or not _all_h(g, h):
            continue
        if g.is_boundary_registered(h):
            continue
        targets = frozenset(g.neighbors(h)) - {v}
        if any(g.type(t) != 1 or g.is_boundary_registered(t) for t in targets):
            continue
        out.append((v, h, targets))
    return out


def _pair_ok(g, l1, h1, t1, l2, h2, t2, strict):
    if h1 == h2 or h2 in t1 or h1 in t2 or l2 in t1 or l1 in t2:
        return False, False, False
    if ((g.phase(l1) + g.phase(l2)) % 2).denominator > 2:
        return False, False, False
    if ((g.phase(l1) - g.phase(l2)) % 2).denominator > 2:
        return False, False, False
    conj = (g.phase(l1) + g.phase(l2)) % 2 == 0
    same = g.phase(l1) == g.phase(l2)
    eqp = g.get_params(l1) == g.get_params(l2)
    if strict and not (eqp and (conj or same)):
        return False, False, False
    return True, conj, eqp


def main():
    names = sys.argv[1:] or list(POLICIES)
    g = build()
    for name in names:
        POLICIES[name]()
        run(g, name)
        dc._find_projector_gadget_pair = _orig_find


if __name__ == "__main__":
    main()
