"""Ground-truth term counts for the full plug under EXPERIMENTAL planners.

Monkeypatches dz.plan_projector_cover with a variable-cardinality ILS
(configurable drop/unmatched weights) and runs find_stab uncapped.

Usage: python dev/full_plug_truth2.py <w_drop> <w_unmatched> [min_pairs]
"""
import os
import pickle
import random
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tsim_tpu.compile.pipeline import _remove_phase_terms
from tsim_tpu.compile.stabrank import find_stab
from tsim_tpu.zx import decompose as dz
from tsim_tpu.zx.simplify import full_reduce, set_shake

W_DROP = float(sys.argv[1]) if len(sys.argv) > 1 else 0.375
W_UNM = float(sys.argv[2]) if len(sys.argv) > 2 else 0.1875
MIN_PAIRS_FRAC = float(sys.argv[3]) if len(sys.argv) > 3 else 0.0


def my_plan_cover(g, gadgets, restarts=512):
    n = len(gadgets)
    allowed_set = set()
    orig_vec = {}
    for i in range(n):
        l1, h1, t1 = gadgets[i]
        for j in range(i + 1, n):
            l2, h2, t2 = gadgets[j]
            if h2 in t1 or h1 in t2 or l2 in t1 or l1 in t2:
                continue
            if ((g.phase(l1) + g.phase(l2)) % 2).denominator > 2:
                continue
            if ((g.phase(l1) - g.phase(l2)) % 2).denominator > 2:
                continue
            D = t1 ^ t2
            Qd = frozenset(g.get_params(h1)) ^ frozenset(g.get_params(h2))
            orig_vec[(i, j)] = frozenset(D) | {("param", p) for p in Qd}
            allowed_set.add((i, j))
    if not allowed_set:
        return []
    all_coords = set()
    for (l, h, t) in gadgets:
        all_coords |= set(t)
        all_coords |= {("param", p) for p in g.get_params(h)}
        all_coords |= {l, h}
    coord_id = {c: k for k, c in enumerate(sorted(all_coords, key=str))}
    umask, lhmask = [], []
    for (l, h, t) in gadgets:
        m = 0
        for c in t:
            m |= 1 << coord_id[c]
        for p in g.get_params(h):
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

    def reduce_v(v, basis):
        for b in basis:
            w = v ^ b
            if w < v:
                v = w
        return v

    min_pairs = int(MIN_PAIRS_FRAC * (n // 2))

    def cost(pairs):
        lh = 0
        for (i, j) in pairs:
            lh |= lhmask[i] | lhmask[j]
        basis = []
        r = dropped = 0
        for (i, j) in pairs:
            own = lhmask[i] | lhmask[j]
            if dmask[(i, j)] & lh & ~own:
                dropped += 1
                continue
            v = reduce_v(umask[i] ^ umask[j], basis)
            if v:
                basis.append(v)
                basis.sort(reverse=True)
                r += 1
        c = r + W_DROP * dropped + W_UNM * (n - 2 * len(pairs))
        if len(pairs) < min_pairs:
            c += 100.0 * (min_pairs - len(pairs))
        return c

    # dependent-first greedy
    lh_all = 0
    for m_ in lhmask:
        lh_all |= m_
    cand = sorted(allowed_set)
    unmatched = set(range(n))
    basis = []
    cur = []
    while len(unmatched) > 1:
        pick = None
        for (i, j) in cand:
            if i not in unmatched or j not in unmatched:
                continue
            own = lhmask[i] | lhmask[j]
            dirty = 1 if dmask[(i, j)] & lh_all & ~own else 0
            v = reduce_v(umask[i] ^ umask[j], basis)
            key = (dirty, 1 if v else 0, bin(v).count("1"))
            if pick is None or key < pick[0]:
                pick = (key, i, j, v)
                if key == (0, 0, 0):
                    break
        if pick is None:
            break
        _, i, j, v = pick
        if v:
            basis.append(v)
            basis.sort(reverse=True)
        cur.append((i, j))
        unmatched -= {i, j}

    budget = min(restarts * n, 8 * n * n)
    rnd = random.Random(0x51AB)
    free = sorted(set(range(n)) - {x for p in cur for x in p})
    cur_cost = cost(cur)
    best, best_cost = list(cur), cur_cost
    best_free = list(free)
    since, stall = 0, max(1024, budget // 8)
    while budget > 0:
        budget -= 1
        since += 1
        if since > stall:
            cur, free = list(best), list(best_free)
            for _ in range(3):
                if len(cur) >= 2:
                    a, b = rnd.sample(range(len(cur)), 2)
                    (i, j), (k, l) = cur[a], cur[b]
                    opts = []
                    for (p, q) in (((i, k), (j, l)), ((i, l), (j, k))):
                        p, q = tuple(sorted(p)), tuple(sorted(q))
                        if p in allowed_set and q in allowed_set:
                            opts.append((p, q))
                    if opts:
                        cur[a], cur[b] = opts[rnd.randrange(len(opts))]
            cur_cost = cost(cur)
            since = 0
            continue
        roll = rnd.random()
        if roll < 0.55 and len(cur) >= 2:
            a, b = rnd.sample(range(len(cur)), 2)
            (i, j), (k, l) = cur[a], cur[b]
            opts = []
            for (p, q) in (((i, k), (j, l)), ((i, l), (j, k))):
                p, q = tuple(sorted(p)), tuple(sorted(q))
                if p in allowed_set and q in allowed_set:
                    opts.append((p, q))
            if not opts:
                continue
            p1, p2 = opts[rnd.randrange(len(opts))]
            old_a, old_b = cur[a], cur[b]
            cur[a], cur[b] = p1, p2
            c = cost(cur)
            if c <= cur_cost:
                cur_cost = c
                if c < best_cost:
                    best, best_cost, best_free = list(cur), c, list(free)
                    since = 0
            else:
                cur[a], cur[b] = old_a, old_b
        elif roll < 0.70 and cur:
            a = rnd.randrange(len(cur))
            i, j = cur[a]
            trial = cur[:a] + cur[a + 1 :]
            c = cost(trial)
            if c <= cur_cost:
                cur = trial
                free += [i, j]
                cur_cost = c
                if c < best_cost:
                    best, best_cost, best_free = list(cur), c, list(free)
                    since = 0
        elif roll < 0.85 and len(free) >= 2:
            i, j = rnd.sample(free, 2)
            p = tuple(sorted((i, j)))
            if p not in allowed_set:
                continue
            trial = cur + [p]
            c = cost(trial)
            if c <= cur_cost:
                cur = trial
                free.remove(i)
                free.remove(j)
                cur_cost = c
                if c < best_cost:
                    best, best_cost, best_free = list(cur), c, list(free)
                    since = 0
        elif cur and free:
            a = rnd.randrange(len(cur))
            i, j = cur[a]
            f = free[rnd.randrange(len(free))]
            keep, out = (i, j) if rnd.random() < 0.5 else (j, i)
            p = tuple(sorted((keep, f)))
            if p not in allowed_set:
                continue
            old = cur[a]
            cur[a] = p
            c = cost(cur)
            if c <= cur_cost:
                free.remove(f)
                free.append(out)
                cur_cost = c
                if c < best_cost:
                    best, best_cost, best_free = list(cur), c, list(free)
                    since = 0
            else:
                cur[a] = old
    return dz._finish_plan_cover(best, gadgets, orig_vec, coord_id)


def run():
    with open("/tmp/rung12.pkl", "rb") as fh:
        plugged = pickle.load(fh)
    dz.plan_projector_cover = my_plan_cover
    prev_s = set_shake(True)
    try:
        g = plugged.copy()
        full_reduce(g, paramSafe=True)
        g.normalize()
        _remove_phase_terms(g)
        t0 = time.time()
        terms = find_stab(g, strategy="cat5", max_terms=None)
        dt = time.time() - t0
        print(f"w_drop={W_DROP} w_unm={W_UNM} min_frac={MIN_PAIRS_FRAC}: "
              f"{len(terms)} terms ({dt:.1f}s)", flush=True)
    finally:
        set_shake(prev_s)


if __name__ == "__main__":
    run()
