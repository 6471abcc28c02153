"""Round-5 planner lab: extract the full-plug rung's matching inputs and
experiment with richer search algorithms offline.

Usage:
  python dev/plan_lab2.py extract [rung_pkl]   # dump planner inputs
  python dev/plan_lab2.py analyze              # bounds + baseline
"""
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsim_tpu.zx import decompose as dz
from tsim_tpu.zx.simplify import full_reduce, set_shake

INPUTS = "/tmp/plan_inputs.pkl"


def extract(path="/tmp/rung12.pkl", shake=True):
    with open(path, "rb") as fh:
        plugged = pickle.load(fh)
    prev = set_shake(shake)
    try:
        g = plugged.copy()
        full_reduce(g, paramSafe=True)
        g.normalize()
        from tsim_tpu.compile.pipeline import _remove_phase_terms

        _remove_phase_terms(g)
        work = g.copy()
        dz.gadgetize_magic(work)
        ts = dz._t_vertices(work)
        gadgets = dz._projector_gadgets(work, ts)
        n = len(gadgets)
        print(f"{n} gadgets")
        # Replicate plan_projector_cover's input construction.
        allowed_set = set()
        orig_vec = {}
        for i in range(n):
            l1, h1, t1 = gadgets[i]
            for j in range(i + 1, n):
                l2, h2, t2 = gadgets[j]
                if h2 in t1 or h1 in t2 or l2 in t1 or l1 in t2:
                    continue
                if ((work.phase(l1) + work.phase(l2)) % 2).denominator > 2:
                    continue
                if ((work.phase(l1) - work.phase(l2)) % 2).denominator > 2:
                    continue
                D = t1 ^ t2
                Qd = frozenset(work.get_params(h1)) ^ frozenset(work.get_params(h2))
                orig_vec[(i, j)] = frozenset(D) | {("param", p) for p in Qd}
                allowed_set.add((i, j))
        all_coords = set()
        for (l, h, t) in gadgets:
            all_coords |= set(t)
            all_coords |= {("param", p) for p in work.get_params(h)}
            all_coords |= {l, h}
        coord_id = {c: k for k, c in enumerate(sorted(all_coords, key=str))}
        umask, lhmask = [], []
        for (l, h, t) in gadgets:
            m = 0
            for c in t:
                m |= 1 << coord_id[c]
            for p in work.get_params(h):
                m |= 1 << coord_id[("param", p)]
            umask.append(m)
            lhmask.append((1 << coord_id[l]) | (1 << coord_id[h]))
        dmask = {}
        for (i, j), vec in orig_vec.items():
            m = 0
            for c in vec:
                if not isinstance(c, tuple):
                    m |= 1 << coord_id[c]
            dmask[(i, j)] = m
        # Phase info for mirror analysis.
        phases = [str(work.phase(l)) for (l, h, t) in gadgets]
        with open(INPUTS, "wb") as fh:
            pickle.dump(
                dict(
                    n=n,
                    umask=umask,
                    lhmask=lhmask,
                    dmask=dmask,
                    allowed=sorted(allowed_set),
                    phases=phases,
                    n_coords=len(all_coords),
                ),
                fh,
            )
        print(f"dumped {INPUTS}: {len(allowed_set)} allowed pairs, "
              f"{len(all_coords)} coords")
    finally:
        set_shake(prev)


def rank_of(vecs):
    basis = []
    r = 0
    for v in vecs:
        for b in basis:
            v = min(v, v ^ b)
        if v:
            basis.append(v)
            basis.sort(reverse=True)
            r += 1
    return r


def analyze():
    with open(INPUTS, "rb") as fh:
        d = pickle.load(fh)
    n, umask = d["n"], d["umask"]
    allowed = set(d["allowed"])
    R = rank_of(list(umask))
    print(f"n={n}, rank(u)={R}, lower bound on matching rank = {R - n // 2}")
    # allowed-graph degree stats
    from collections import Counter

    deg = Counter()
    for (i, j) in allowed:
        deg[i] += 1
        deg[j] += 1
    print(f"allowed pairs: {len(allowed)}, degree min/median/max: "
          f"{min(deg.values())}/{sorted(deg.values())[n//2]}/{max(deg.values())}")
    print("phases:", Counter(d["phases"]))
    # Pairs with zero difference vector
    zero_pairs = [(i, j) for (i, j) in allowed if umask[i] == umask[j]]
    print(f"identical-u pairs: {len(zero_pairs)}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "analyze"
    if cmd == "extract":
        extract(*sys.argv[2:3])
    else:
        analyze()
