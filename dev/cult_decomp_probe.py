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
        sr.replace_magic_states = _orig_replace




def _pairvec(g, h1, t1, h2, t2):
    D = t1 ^ t2
    Qd = frozenset(g.get_params(h1)) ^ frozenset(g.get_params(h2))
    return frozenset(D) | frozenset(("param", p) for p in Qd)


def _reduce_vec(basis, vec):
    v = set(vec)
    while v:
        piv = max(v, key=str)
        if piv in basis:
            v ^= basis[piv]
        else:
            return piv, v
    return None, v


def _minrank_matching(g, gadgets, strict):
    """Greedy perfect-matching minimizing GF(2) rank of pair symdiff vectors.

    Returns list of (l1, h1, l2, h2) in selection order."""
    allowed = []
    for i, (l1, h1, t1) in enumerate(gadgets):
        for j in range(i + 1, len(gadgets)):
            l2, h2, t2 = gadgets[j]
            ok, conj, eqp = _pair_ok(g, l1, h1, t1, l2, h2, t2, strict)
            if not ok:
                continue
            static = (2000 if eqp else 0) + (1000 if conj else 0) + 10 * len(t1 & t2) - len(t1 ^ t2)
            allowed.append((i, j, static, _pairvec(g, h1, t1, h2, t2)))
    unmatched = set(range(len(gadgets)))
    basis = {}
    chosen = []
    while len(unmatched) > 1:
        best = None
        for (i, j, static, vec) in allowed:
            if i not in unmatched or j not in unmatched:
                continue
            piv, v = _reduce_vec(basis, vec)
            key = (0 if piv is None else 1, len(v), -static)
            if best is None or key < best[0]:
                best = (key, i, j, piv, v)
        if best is None:
            break
        _, i, j, piv, v = best
        if piv is not None:
            basis[piv] = v
        gi, gj = gadgets[i], gadgets[j]
        chosen.append((gi[0], gi[1], gj[0], gj[1]))
        unmatched -= {i, j}
    return chosen


@policy("minrank")
def p_minrank():
    def find(g, ts, strict=True):
        gadgets = _gadgets(g, ts)
        if not gadgets:
            return None
        chosen = _minrank_matching(g, gadgets, strict)
        if not chosen:
            return None
        return chosen[0]

    dc._find_projector_gadget_pair = find


@policy("minrank_first")
def p_minrank_first():
    """minrank selection AND projector split takes precedence over the
    conjugate 3-term split (TSIM_TPU_PROJ_SPLIT=before equivalent)."""
    p_minrank()
    dc._PROJ_ORDER = "before"




def _gadgetize_plain_ts(g):
    from fractions import Fraction as _F
    from tsim_tpu.zx.graph import Z as _Z, HADAMARD as _H
    from tsim_tpu.zx.decompose import _all_h as allh
    ts = [v for v in g.vertices() if g.phase(v).denominator == 4]
    changed = False
    for v in list(ts):
        if g.type(v) != _Z or g.is_boundary_registered(v):
            continue
        if g.degree(v) == 1 and allh(g, v):
            continue  # already a gadget leaf
        if not allh(g, v):
            continue
        a = g.phase(v); P = g.get_params(v)
        g.set_phase(v, 0)
        g.set_params(v, ())
        hub = g.add_vertex(_Z, qubit=g.qubit(v) - 0.5, row=g.row(v))
        leaf = g.add_vertex(_Z, qubit=g.qubit(v) - 1.0, row=g.row(v), phase=a)
        g.set_params(leaf, P)
        g.add_edge((v, hub), _H)
        g.add_edge((hub, leaf), _H)
        changed = True
    return changed


_orig_replace = dc.replace_magic_states


import tsim_tpu.compile.stabrank as sr


def _make_gadgetize_replace(find):
    def replace(g, pick_random=False, strategy="cat5"):
        ts_all = dc._t_vertices(g)
        if ts_all and strategy == "cat5":
            _gadgetize_plain_ts(g)
            ts2 = dc._t_vertices(g)
            motif = find(g, ts2, strict=True)
            if motif is None:
                motif = find(g, ts2, strict=False)
            if motif is not None:
                return dc.split_gadget_pair_projector(g, *motif)
        return _orig_replace(g, pick_random, strategy)
    return replace


@policy("gadgetize")
def p_gadgetize():
    sr.replace_magic_states = _make_gadgetize_replace(_orig_find)


@policy("gadgetize_minrank")
def p_gadgetize_minrank():
    def find(g, ts, strict=True):
        gadgets = _gadgets(g, ts)
        if not gadgets:
            return None
        chosen = _minrank_matching(g, gadgets, strict)
        return chosen[0] if chosen else None
    sr.replace_magic_states = _make_gadgetize_replace(find)


if __name__ == "__main__":
    main()
