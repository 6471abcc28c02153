"""Planner lab for the grown-cultivation heavy rungs.

Reproduces the compile pipeline's plugged ladder for the big component of
``cultivation_d3_grown(checks=2)``, then for each heavy rung reports the
pair-projector plan rank under different planner budgets — the tool that
drove the rank-16 investigation (final rungs planned at rank 16 = 65k
leaves while neighbors plan at 10-11).

Usage: python dev/heavy_rung_lab.py [checks] [first_rung] [last_rung]
"""
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsim_tpu.compile.pipeline import _get_f_indices, _plug_outputs, _remove_phase_terms
from tsim_tpu.core.graph_prep import connected_components, classify_direct, prepare_graph
from tsim_tpu.models.cultivation import cultivation_d3_grown
from tsim_tpu.zx import decompose as dz
from tsim_tpu.zx.simplify import full_reduce, set_shake


def ladder_graphs(checks: int):
    c = cultivation_d3_grown(p=0.001, checks=checks)
    prepared = prepare_graph(c, sample_detectors=True)
    comps = [c_ for c_ in connected_components(prepared.graph) if classify_direct(c_) is None]
    comps.sort(key=lambda c_: len(c_.output_indices))
    big = comps[-1]
    g = big.graph
    n_out = len(g.outputs())
    m_chars = [f"m{i}" for i in big.output_indices]
    return _plug_outputs(g, m_chars, list(range(n_out + 1)))


def rung_plan_rank(plugged, shake: bool, restarts=512, stale=64):
    prev = set_shake(shake)
    try:
        g = plugged.copy()
        full_reduce(g, paramSafe=True)
        g.normalize()
        _remove_phase_terms(g)
        work = g.copy()
        dz.gadgetize_magic(work)
        ts = dz._t_vertices(work)
        gadgets = dz._projector_gadgets(work, ts)
        if len(gadgets) < 4:
            return None, len(gadgets), 0
        pairs = plan_with(work, gadgets, restarts, stale)
        if len(pairs) < 2:
            return None, len(gadgets), len(pairs)
        rank, _ = dz._consistency_exprs([v for (_, _, v) in pairs])
        return rank, len(gadgets), len(pairs)
    finally:
        set_shake(prev)


def plan_with(work, gadgets, restarts, stale):
    # plan_projector_cover with an adjustable stale limit (monkeyable).
    import tsim_tpu.zx.decompose as d

    old = d.plan_projector_cover.__defaults__
    return d.plan_projector_cover(work, gadgets, restarts=restarts)


if __name__ == "__main__":
    checks = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    t0 = time.time()
    plugged = ladder_graphs(checks)
    print(f"{len(plugged)} rungs built ({time.time()-t0:.1f}s)", flush=True)
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else len(plugged) - 1
    for k in range(lo, min(hi + 1, len(plugged))):
        t0 = time.time()
        rank, ngad, npairs = rung_plan_rank(plugged[k], shake=True)
        print(
            f"rung {k}: gadgets={ngad} pairs={npairs} rank={rank}"
            f" ({time.time()-t0:.1f}s)",
            flush=True,
        )
        if rank is not None and rank >= 12:
            with open(f"/tmp/rung{k}.pkl", "wb") as fh:
                pickle.dump(plugged[k], fh)
            print(f"  dumped /tmp/rung{k}.pkl", flush=True)
