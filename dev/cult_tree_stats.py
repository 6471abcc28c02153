"""Record decomposition-tree statistics for the cultivation component.

Logs, per replace_magic_states / replace_u3_states call: T-count, U3-count,
which split kind fired, branch count. Histograms at the end show where the
branching budget goes and what motifs force the bad (2-terms-per-2-quarter)
fallbacks. Usage: JAX_PLATFORMS=cpu python dev/cult_tree_stats.py
"""

import sys
import time
from collections import Counter

sys.path.insert(0, "/root/repo")

from tsim_tpu.core.graph_prep import connected_components, prepare_graph
from tsim_tpu.compile.pipeline import _plug_outputs
from tsim_tpu.compile.stabrank import find_stab
from tsim_tpu.models.cultivation import cultivation_d3
from tsim_tpu.zx.simplify import set_shake
from tsim_tpu.zx import decompose as dc

calls = Counter()
fallback_motifs = Counter()

_orig_magic = dc.replace_magic_states
_orig_u3 = dc.replace_u3_states


def gadget_info(g, ts):
    """Summaries of gadget structure among magic vertices."""
    out = []
    for v in ts:
        if g.degree(v) == 1:
            (h,) = g.neighbors(v)
            tgts = frozenset(g.neighbors(h)) - {v}
            out.append((v, h, tgts, g.phase(v)))
        else:
            out.append((v, None, frozenset(g.neighbors(v)), g.phase(v)))
    return out


def patched_magic(g, pick_random=False, strategy="cat5"):
    ts = dc._t_vertices(g)
    tc = len(ts)
    if not ts:
        return _orig_magic(g, pick_random, strategy)
    motif = dc._find_conjugate_gadget_pair(g, ts)
    if motif is not None:
        calls[("conj_gadget", 3)] += 1
        return dc.split_conjugate_gadget_pair(g, *motif)
    motif = dc._find_projector_gadget_pair(g, ts, strict=True)
    if motif is not None:
        calls[("projector", 2)] += 1
        return dc.split_gadget_pair_projector(g, *motif)
    # fallback territory: record the motif structure
    if len(ts) >= 2:
        calls[("t_pair", 2)] += 1
        info = gadget_info(g, ts)
        phases = Counter(p for (_, _, _, p) in info)
        n_gadgets = sum(1 for (_, h, _, _) in info if h is not None)
        # pairwise target-overlap profile
        best_sym = 10**9
        for i in range(len(info)):
            for j in range(i + 1, len(info)):
                sym = len(info[i][2] ^ info[j][2])
                best_sym = min(best_sym, sym)
        fallback_motifs[
            (tc, n_gadgets, tuple(sorted(phases.items())), best_sym)
        ] += 1
        return dc.split_t_pair(g, *dc._best_t_pair(g, ts))
    calls[("cut", 2)] += 1
    return dc.cut_vertex(g, ts[0])


def patched_u3(g, strategy="cat5"):
    u3s_before = dc.u3_count(g)
    res = _orig_u3(g, strategy)
    calls[("u3", len(res.graphs))] += 1
    return res


def main():
    set_shake(False)
    c = cultivation_d3(p=0.001)
    prepared = prepare_graph(c, sample_detectors=True)
    cc = max(
        connected_components(prepared.graph), key=lambda x: x.graph.num_vertices()
    )
    m_chars = [f"m{i}" for i in cc.output_indices]
    g = _plug_outputs(cc.graph, m_chars, [len(cc.graph.outputs())])[0]
    print(f"component: V={g.num_vertices()} T={dc.tcount(g)} U3={dc.u3_count(g)}")

    import tsim_tpu.compile.stabrank as sr

    dc.replace_magic_states = patched_magic
    dc.replace_u3_states = patched_u3
    sr.replace_magic_states = patched_magic
    sr.replace_u3_states = patched_u3
    t0 = time.perf_counter()
    gl = find_stab(g, strategy="cat5")
    print(f"terms={len(gl)} in {time.perf_counter() - t0:.0f}s")
    print("\nsplit kinds (kind, branches): count")
    for k, v in calls.most_common():
        print(f"  {k}: {v}")
    print("\nfallback motifs (tcount, n_gadgets, phase histogram, min symdiff):")
    for k, v in fallback_motifs.most_common(25):
        print(f"  {k}: {v}")


if __name__ == "__main__":
    main()
