"""Ground-truth term counts for the grown full plug under planner variants.

Loads /tmp/rung12.pkl and runs find_stab uncapped under each variant,
reporting final term counts and wall time.

Usage: python dev/full_plug_truth.py [w1 w2 ...]
"""
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsim_tpu.compile.pipeline import _remove_phase_terms
from tsim_tpu.compile.stabrank import find_stab
from tsim_tpu.zx import decompose as dz
from tsim_tpu.zx.simplify import full_reduce, set_shake


def run(w, shake=True, pi_hub=True):
    with open("/tmp/rung12.pkl", "rb") as fh:
        plugged = pickle.load(fh)
    prev_s = set_shake(shake)
    prev_p = dz.set_pi_hub_normalize(pi_hub)
    prev_w = dz.set_plan_drop_penalty(w)
    try:
        g = plugged.copy()
        full_reduce(g, paramSafe=True)
        g.normalize()
        _remove_phase_terms(g)
        t0 = time.time()
        terms = find_stab(g, strategy="cat5", max_terms=None)
        dt = time.time() - t0
        print(f"w={w} shake={shake} pi_hub={pi_hub}: {len(terms)} terms "
              f"({dt:.1f}s)", flush=True)
        return len(terms)
    finally:
        set_shake(prev_s)
        dz.set_pi_hub_normalize(prev_p)
        dz.set_plan_drop_penalty(prev_w)


if __name__ == "__main__":
    ws = [float(x) for x in sys.argv[1:]] or [1.0, 0.375]
    for w in ws:
        run(w)
