"""Probe the planner on the 2-check cultivation middle rungs (the 2048s).

Builds the prepared component once, plugs k outputs, reduces, and reports
gadget count / planned rank / leaf count under planner knob settings.
Usage: python dev/cult2_rung_probe.py [k ...]
"""
import os, sys, time, pickle
os.environ.setdefault("JAX_PLATFORMS", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from tsim_tpu.models.cultivation import cultivation_d3
from tsim_tpu.core.graph_prep import prepare_graph, connected_components
from tsim_tpu.compile.pipeline import _plug_outputs, _remove_phase_terms
from tsim_tpu.zx.simplify import full_reduce
from tsim_tpu.zx import decompose as dz

CACHE = "/tmp/cult2_component.pkl"

def get_component():
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as fh:
            return pickle.load(fh)
    c = cultivation_d3(checks=2)
    prepared = prepare_graph(c, sample_detectors=True)
    comps = connected_components(prepared.graph)
    comp = max(comps, key=lambda cc: len(cc.output_indices))
    with open(CACHE, "wb") as fh:
        pickle.dump(comp, fh)
    return comp

def probe(k, restarts_list=(48, 256, 1024)):
    comp = get_component()
    g = comp.graph
    n_out = len(g.outputs())
    m_chars = [f"m{i}" for i in comp.output_indices]
    plugged = _plug_outputs(g, m_chars, [k])[0]
    t0 = time.time()
    full_reduce(plugged, paramSafe=True)
    plugged.normalize()
    _remove_phase_terms(plugged)
    print(f"k={k}: reduced in {time.time()-t0:.1f}s, tcount={dz.tcount(plugged)}")
    work = plugged.copy()
    dz.gadgetize_magic(work)
    ts = dz._t_vertices(work)
    gadgets = dz._projector_gadgets(work, ts)
    print(f"  t-vertices={len(ts)} projector-gadgets={len(gadgets)}")
    for r in restarts_list:
        t0 = time.time()
        pairs = dz.plan_projector_cover(work, gadgets, restarts=r)
        vecs = [v for (_, _, v) in pairs]
        assigns = dz._consistent_assignments(vecs, max_rank=14)
        rank = None if assigns is None else len(assigns).bit_length() - 1
        unmatched = len(gadgets) - 2 * len(pairs)
        print(f"  restarts={r}: pairs={len(pairs)} unmatched={unmatched} "
              f"rank={rank} ({time.time()-t0:.1f}s)")
    # full decomposition leaf count at the default
    t0 = time.time()
    leaves = dz.planned_magic_decomposition(plugged.copy())
    print(f"  planned leaves={None if leaves is None else len(leaves)} "
          f"({time.time()-t0:.1f}s)")

if __name__ == "__main__":
    ks = [int(a) for a in sys.argv[1:]] or [6, 9]
    for k in ks:
        probe(k)
