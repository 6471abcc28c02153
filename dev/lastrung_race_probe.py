"""Instrument the variant race on the grown checks=2 LAST rung only.

Builds the big component's full plug via the pipeline's own plumbing,
then runs find_stab per variant uncapped, logging term counts + time.
"""
import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsim_tpu.compile.pipeline import _plug_outputs, _remove_phase_terms
from tsim_tpu.compile.stabrank import find_stab
from tsim_tpu.core.graph_prep import (
    classify_direct,
    connected_components,
    prepare_graph,
)
from tsim_tpu.models.cultivation import cultivation_d3_grown
from tsim_tpu.zx import decompose as dz
from tsim_tpu.zx.simplify import full_reduce, set_shake

c = cultivation_d3_grown(p=0.001, checks=2)
prepared = prepare_graph(c, sample_detectors=True)
comps = [
    cc for cc in connected_components(prepared.graph) if classify_direct(cc) is None
]
comps.sort(key=lambda cc: len(cc.output_indices))
big = comps[-1]
g = big.graph
n_out = len(g.outputs())
m_chars = [f"m{i}" for i in big.output_indices]
plugged = _plug_outputs(g, m_chars, [n_out])[0]
print(f"full plug built, {n_out} outputs", flush=True)

for shake in (True, False):
    for ph in (True, False):
        prev_s = set_shake(shake)
        prev_p = dz.set_pi_hub_normalize(ph)
        t0 = time.time()
        try:
            gg = plugged.copy()
            full_reduce(gg, paramSafe=True)
            gg.normalize()
            _remove_phase_terms(gg)
            t0 = time.time()
            terms = find_stab(gg, strategy="cat5", max_terms=8192)
            print(
                f"shake={shake} pi_hub={ph}: {len(terms)} terms "
                f"({time.time()-t0:.1f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"shake={shake} pi_hub={ph}: {type(e).__name__} {e} "
                  f"({time.time()-t0:.1f}s)", flush=True)
        finally:
            set_shake(prev_s)
            dz.set_pi_hub_normalize(prev_p)
