"""Which pair should the peel split? Try each independent-vector pair at
the root and report child plan ranks."""
import os
import pickle
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsim_tpu.compile.pipeline import _remove_phase_terms
from tsim_tpu.zx import decompose as dz
from tsim_tpu.zx.simplify import full_reduce, set_shake


def plan_rank(g, restarts=512):
    work = g.copy()
    dz.gadgetize_magic(work)
    ts = dz._t_vertices(work)
    gadgets = dz._projector_gadgets(work, ts)
    if len(gadgets) < 4:
        return None
    pairs = dz.plan_projector_cover(work, gadgets, restarts)
    if len(pairs) < 2:
        return None
    rank, _ = dz._consistency_exprs([v for (_, _, v) in pairs])
    return rank


def main():
    with open("/tmp/rung12.pkl", "rb") as fh:
        plugged = pickle.load(fh)
    prev = set_shake(True)
    try:
        g = plugged.copy()
        full_reduce(g, paramSafe=True)
        g.normalize()
        _remove_phase_terms(g)
        work = g.copy()
        dz.gadgetize_magic(work)
        ts = dz._t_vertices(work)
        gadgets = dz._projector_gadgets(work, ts)
        pairs = dz.plan_projector_cover(work, gadgets, 512)
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
        print(f"plan: {len(pairs)} pairs, {len(indep)} independent")
        for idx in indep:
            i, j, vec = pairs[idx]
            l1, h1, _ = gadgets[i]
            l2, h2, _ = gadgets[j]
            t0 = time.time()
            ranks = []
            for c in (0, 1):
                gg = work.copy()
                dz.apply_pair_projector(gg, l1, h1, l2, h2, c)
                full_reduce(gg, paramSafe=True)
                if gg.scalar.is_zero:
                    ranks.append("zero")
                    continue
                ranks.append(plan_rank(gg))
            print(f"pair#{idx} |vec|={len(vec)}: child ranks {ranks} "
                  f"({time.time()-t0:.1f}s)", flush=True)
    finally:
        set_shake(prev)


if __name__ == "__main__":
    main()
