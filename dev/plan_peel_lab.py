"""Peeling experiment: split one gadget pair, reduce, re-plan branches.

Does the full-plug instance get easier after one projector split + reduce?

Usage: python dev/plan_peel_lab.py [depth]
"""
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsim_tpu.compile.pipeline import _remove_phase_terms
from tsim_tpu.zx import decompose as dz
from tsim_tpu.zx.simplify import full_reduce, set_shake


def plan_info(g):
    """(rank, drops, n_gadgets, pairs) for g's current plan."""
    work = g.copy()
    dz.gadgetize_magic(work)
    ts = dz._t_vertices(work)
    gadgets = dz._projector_gadgets(work, ts)
    if len(gadgets) < 4:
        return None, 0, len(gadgets), []
    pairs = dz.plan_projector_cover(work, gadgets, 512)
    if len(pairs) < 2:
        return None, 0, len(gadgets), []
    rank, _ = dz._consistency_exprs([v for (_, _, v) in pairs])
    return rank, len(gadgets) - 2 * len(pairs), len(gadgets), (work, gadgets, pairs)


def peel_once(g, which=0):
    """Apply split_gadget_pair_projector on one plannable pair; return the
    two reduced branches."""
    work = g.copy()
    dz.gadgetize_magic(work)
    ts = dz._t_vertices(work)
    gadgets = dz._projector_gadgets(work, ts)
    pairs = dz.plan_projector_cover(work, gadgets, 512)
    # Choose the pair contributing the highest-order independent vector:
    # re-eliminate in order and take the LAST independent one (vs 'which').
    vecs = [v for (_, _, v) in pairs]
    basis = {}
    indep = []
    for idx, vec in enumerate(vecs):
        v = set(vec)
        while v:
            piv = max(v)
            b = basis.get(piv)
            if b is None:
                basis[piv] = frozenset(v)
                indep.append(idx)
                break
            v ^= b
    target = indep[-1 - which] if which < len(indep) else indep[-1]
    i, j, _ = pairs[target]
    l1, h1, _t1 = gadgets[i]
    l2, h2, _t2 = gadgets[j]
    out = []
    for c in (0, 1):
        gg = work.copy()
        dz.apply_pair_projector(gg, l1, h1, l2, h2, c)
        full_reduce(gg, paramSafe=True)
        if not gg.scalar.is_zero:
            out.append(gg)
    return out


def main():
    depth = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    with open("/tmp/rung12.pkl", "rb") as fh:
        plugged = pickle.load(fh)
    prev = set_shake(True)
    try:
        g = plugged.copy()
        full_reduce(g, paramSafe=True)
        g.normalize()
        _remove_phase_terms(g)
        t0 = time.time()
        rank, unm, ngad, _ = plan_info(g)
        print(f"root: rank={rank} unmatched={unm} gadgets={ngad} "
              f"({time.time()-t0:.1f}s)", flush=True)
        level = [g]
        for d in range(depth):
            nxt = []
            for k, gg in enumerate(level):
                t0 = time.time()
                branches = peel_once(gg)
                info = []
                for b in branches:
                    r, u, ng, _ = plan_info(b)
                    info.append((r, u, ng))
                    nxt.append(b)
                print(f"depth {d} node {k}: branches={len(branches)} "
                      f"plans={info} ({time.time()-t0:.1f}s)", flush=True)
            level = nxt
            if len(level) > 8:
                level = level[:8]
                print("  (truncating to 8 nodes)")
    finally:
        set_shake(prev)


if __name__ == "__main__":
    main()
