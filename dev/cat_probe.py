"""Probe: T-vertex neighborhood structure at find_stab entry for d3 distillation.

Shows how many magic vertices group into cat_k structures (k T-spiders
Hadamard-attached to a common phase-free hub), to size the win from cat
decompositions vs. the current pair-split.
"""
import os
import sys
from collections import Counter

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_PLATFORMS", "cpu")

from tsim_tpu.core.graph_prep import connected_components, prepare_graph, get_params, classify_direct
from tsim_tpu.compile.pipeline import _plug_outputs, _remove_phase_terms, _get_f_indices
from tsim_tpu.compile.stabrank import find_stab_u3
from tsim_tpu.zx.decompose import tcount, u3_count, _t_vertices
from tsim_tpu.zx.graph import HADAMARD, SIMPLE, Z, X
from tsim_tpu.zx.simplify import full_reduce
from tsim_tpu.models.distillation import distillation_d3


def analyze(g, label):
    ts = _t_vertices(g)
    print(f"--- {label}: {g.num_vertices()} verts, tcount={len(ts)}, u3={u3_count(g)}")
    hub_legs = Counter()  # hub vertex -> number of T legs
    loose = []
    for v in ts:
        deg = g.degree(v)
        if deg == 1:
            (h,) = g.neighbors(v)
            et = g.edge_type((v, h))
            hub_legs[(h, et)] += 1
        else:
            loose.append((v, deg))
    cat_sizes = Counter()
    for (h, et), n in hub_legs.items():
        hp = g.phase(h)
        hparams = g.get_params(h)
        hdeg = g.degree(h)
        cat_sizes[(n, str(hp), len(hparams), g.type(h), et, hdeg)] += 1
    print("  leaf clusters (n_T_legs, hub_phase, hub_nparams, hub_type, edge_ty, hub_deg) -> count:")
    for k, c in sorted(cat_sizes.items()):
        print(f"    {k}: {c}")
    print(f"  non-leaf T vertices: {len(loose)} degs={Counter(d for _, d in loose)}")


def main():
    circuit = distillation_d3(p=0.05)
    prepared = prepare_graph(circuit, sample_detectors=True)
    comps = connected_components(prepared.graph)
    f_indices_global = _get_f_indices(prepared.graph)
    big = max(comps, key=lambda c: len(c.output_indices))
    g = big.graph
    n_out = len(g.outputs())
    print(f"largest cc: {len(big.output_indices)} outputs, {g.num_vertices()} verts")
    m_chars = [f"m{i}" for i in big.output_indices]
    plugged = _plug_outputs(g, m_chars, [n_out])[0]
    full_reduce(plugged, paramSafe=True)
    plugged.normalize()
    _remove_phase_terms(plugged)
    analyze(plugged, "fully plugged, after reduce")
    graphs = find_stab_u3([plugged], strategy="cat5")
    print(f"after u3 strip: {len(graphs)} graphs")
    for i, gg in enumerate(graphs[:4]):
        analyze(gg, f"u3-stripped graph {i}")


if __name__ == "__main__":
    main()
