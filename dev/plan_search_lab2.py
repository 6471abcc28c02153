"""Round-5 matching search v2: variable-cardinality ILS.

Moves: 2-swap (re-pair two pairs), unpair (pair -> 2 unmatched),
match (2 unmatched -> pair), exchange (matched gadget <-> unmatched).
Cost identical to the production planner.

Usage: python dev/plan_search_lab2.py [w] [budget_mult] [seeds...]
"""
import pickle
import random
import sys
import time

with open("/tmp/plan_inputs.pkl", "rb") as fh:
    D = pickle.load(fh)

N = D["n"]
U = D["umask"]
LH = D["lhmask"]
DM = D["dmask"]
ALLOWED = set(D["allowed"])
NEIGH = {i: set() for i in range(N)}
for (i, j) in ALLOWED:
    NEIGH[i].add(j)
    NEIGH[j].add(i)


def reduce_v(v, basis):
    for b in basis:
        w = v ^ b
        if w < v:
            v = w
    return v


def cost_detail(pairs):
    lh = 0
    for (i, j) in pairs:
        lh |= LH[i] | LH[j]
    basis = []
    r = dropped = 0
    for (i, j) in pairs:
        own = LH[i] | LH[j]
        if DM[(i, j)] & lh & ~own:
            dropped += 1
            continue
        v = reduce_v(U[i] ^ U[j], basis)
        if v:
            basis.append(v)
            basis.sort(reverse=True)
            r += 1
    return r, dropped, N - 2 * len(pairs)


def cost(pairs, w):
    r, d, um = cost_detail(pairs)
    return r + w * d + 0.5 * w * um


def greedy_start():
    lh_all = 0
    for m in LH:
        lh_all |= m
    cand = sorted(ALLOWED)
    unmatched = set(range(N))
    basis = []
    cur = []
    while len(unmatched) > 1:
        pick = None
        for (i, j) in cand:
            if i not in unmatched or j not in unmatched:
                continue
            own = LH[i] | LH[j]
            dirty = 1 if DM[(i, j)] & lh_all & ~own else 0
            v = reduce_v(U[i] ^ U[j], basis)
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
    return cur


def vils(start, budget, w, seed):
    """Variable-cardinality ILS."""
    rnd = random.Random(seed)
    cur = list(start)
    free = sorted(set(range(N)) - {x for p in cur for x in p})
    cur_cost = cost(cur, w)
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
                        if p in ALLOWED and q in ALLOWED:
                            opts.append((p, q))
                    if opts:
                        cur[a], cur[b] = opts[rnd.randrange(len(opts))]
            cur_cost = cost(cur, w)
            since = 0
            continue
        roll = rnd.random()
        if roll < 0.55 and len(cur) >= 2:
            # 2-swap
            a, b = rnd.sample(range(len(cur)), 2)
            (i, j), (k, l) = cur[a], cur[b]
            opts = []
            for (p, q) in (((i, k), (j, l)), ((i, l), (j, k))):
                p, q = tuple(sorted(p)), tuple(sorted(q))
                if p in ALLOWED and q in ALLOWED:
                    opts.append((p, q))
            if not opts:
                continue
            p1, p2 = opts[rnd.randrange(len(opts))]
            old_a, old_b = cur[a], cur[b]
            cur[a], cur[b] = p1, p2
            c = cost(cur, w)
            if c <= cur_cost:
                cur_cost = c
                if c < best_cost:
                    best, best_cost = list(cur), c
                    best_free = list(free)
                    since = 0
            else:
                cur[a], cur[b] = old_a, old_b
        elif roll < 0.70 and cur:
            # unpair
            a = rnd.randrange(len(cur))
            i, j = cur[a]
            trial = cur[:a] + cur[a + 1 :]
            c = cost(trial, w)
            if c <= cur_cost:
                cur = trial
                free += [i, j]
                cur_cost = c
                if c < best_cost:
                    best, best_cost = list(cur), c
                    best_free = list(free)
                    since = 0
        elif roll < 0.85 and len(free) >= 2:
            # match two free gadgets
            i, j = rnd.sample(free, 2)
            p = tuple(sorted((i, j)))
            if p not in ALLOWED:
                continue
            trial = cur + [p]
            c = cost(trial, w)
            if c <= cur_cost:
                cur = trial
                free.remove(i)
                free.remove(j)
                cur_cost = c
                if c < best_cost:
                    best, best_cost = list(cur), c
                    best_free = list(free)
                    since = 0
        elif cur and free:
            # exchange: swap a matched gadget with a free one
            a = rnd.randrange(len(cur))
            i, j = cur[a]
            f = free[rnd.randrange(len(free))]
            keep, out = (i, j) if rnd.random() < 0.5 else (j, i)
            p = tuple(sorted((keep, f)))
            if p not in ALLOWED:
                continue
            old = cur[a]
            cur[a] = p
            c = cost(cur, w)
            if c <= cur_cost:
                free.remove(f)
                free.append(out)
                cur_cost = c
                if c < best_cost:
                    best, best_cost = list(cur), c
                    best_free = list(free)
                    since = 0
            else:
                cur[a] = old
    return best, best_cost


def main():
    w = float(sys.argv[1]) if len(sys.argv) > 1 else 0.375
    mult = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    seeds = [int(s) for s in sys.argv[3:]] or [0x51AB, 1, 2, 3]
    g = greedy_start()
    print(f"greedy: {cost_detail(g)}")
    budget = int(mult * min(512 * N, 8 * N * N))
    for seed in seeds:
        t0 = time.time()
        best, bc = vils(g, budget, w, seed)
        r, d, um = cost_detail(best)
        print(f"vILS w={w} seed={seed:#x}: cost={bc:.2f} "
              f"rank={r} dropped={d} unmatched={um} pairs={len(best)} "
              f"({time.time()-t0:.1f}s)")
        with open(f"/tmp/plan_w{w}_s{seed}.pkl", "wb") as fh:
            pickle.dump(best, fh)


if __name__ == "__main__":
    main()
