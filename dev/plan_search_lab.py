"""Search-algorithm experiments for the full-plug matching plateau.

Loads /tmp/plan_inputs.pkl (written by plan_lab2.py extract) and compares
matching-search strategies on the real rung-12 instance.
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


def reduce_v(v, basis):
    for b in basis:
        w = v ^ b
        if w < v:
            v = w
    return v


def insert_b(basis, v):
    basis.append(v)
    basis.sort(reverse=True)


def cost_detail(pairs):
    """Return (rank, dropped, unmatched)."""
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
            insert_b(basis, v)
            r += 1
    return r, dropped, N - 2 * len(pairs)


def cost(pairs, w=1.0):
    r, d, um = cost_detail(pairs)
    return r + w * d + 0.5 * w * um


# ---------------------------------------------------------------- baseline ILS
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
            insert_b(basis, v)
        cur.append((i, j))
        unmatched -= {i, j}
    return cur


def swap_opts(pa, pb):
    (i, j), (k, l) = pa, pb
    opts = []
    p = (min(i, k), max(i, k))
    q = (min(j, l), max(j, l))
    if p in ALLOWED and q in ALLOWED:
        opts.append((p, q))
    p = (min(i, l), max(i, l))
    q = (min(j, k), max(j, k))
    if p in ALLOWED and q in ALLOWED:
        opts.append((p, q))
    return opts


def ils(cur, budget, w=1.0, seed=0x51AB, use3=False):
    rnd = random.Random(seed)
    m = len(cur)
    cur = list(cur)
    cur_cost = cost(cur, w)
    best, best_cost = list(cur), cur_cost
    since, stall = 0, max(1024, budget // 8)
    while budget > 0 and m >= 2:
        budget -= 1
        since += 1
        if since > stall:
            cur = list(best)
            for _ in range(3):
                a, b = rnd.randrange(m), rnd.randrange(m - 1)
                if b >= a:
                    b += 1
                opts = swap_opts(cur[a], cur[b])
                if opts:
                    cur[a], cur[b] = opts[rnd.randrange(len(opts))]
            cur_cost = cost(cur, w)
            since = 0
            continue
        if use3 and rnd.random() < 0.3 and m >= 3:
            # 3-swap: rotate partners among three pairs
            idx = rnd.sample(range(m), 3)
            (a1, b1), (a2, b2), (a3, b3) = (cur[t] for t in idx)
            # try a cyclic re-pairing
            cands = [
                ((a1, b2), (a2, b3), (a3, b1)),
                ((a1, b3), (a3, b2), (a2, b1)),
                ((a1, a2), (b1, b2), (a3, b3)),
            ]
            done = False
            for trio in cands:
                trio = [tuple(sorted(p)) for p in trio]
                if all(p in ALLOWED for p in trio):
                    old = [cur[t] for t in idx]
                    for t, p in zip(idx, trio):
                        cur[t] = p
                    c = cost(cur, w)
                    if c <= cur_cost:
                        cur_cost = c
                        if c < best_cost:
                            best, best_cost = list(cur), c
                            since = 0
                        done = True
                        break
                    for t, p in zip(idx, old):
                        cur[t] = p
            continue
        a, b = rnd.randrange(m), rnd.randrange(m - 1)
        if b >= a:
            b += 1
        opts = swap_opts(cur[a], cur[b])
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
                since = 0
        else:
            cur[a], cur[b] = old_a, old_b
    return best, best_cost


# ------------------------------------------------- subspace-guided matching
def perfect_matching_in(edges):
    """Max matching via networkx; returns list of pairs (maybe not perfect)."""
    import networkx as nx

    G = nx.Graph()
    G.add_nodes_from(range(N))
    G.add_edges_from(edges)
    m = nx.max_weight_matching(G, maxcardinality=True)
    return [tuple(sorted(p)) for p in m]


def edges_in_subspace(basis):
    """Allowed pairs whose difference vector reduces to 0 against basis."""
    return [
        (i, j) for (i, j) in ALLOWED if reduce_v(U[i] ^ U[j], basis) == 0
    ]


def subspace_from(pairs):
    basis = []
    for (i, j) in pairs:
        v = reduce_v(U[i] ^ U[j], basis)
        if v:
            insert_b(basis, v)
    return basis


def anneal_subspace(seed_pairs, iters=2000, seed=7):
    """Local search over difference subspaces: start from a matching's
    basis, try dropping/replacing basis vectors while a perfect matching
    survives in the covered-pair graph."""
    rnd = random.Random(seed)
    basis = subspace_from(seed_pairs)
    # candidate vectors: all pair differences with small residual popcounts
    best_basis = list(basis)
    edges = edges_in_subspace(best_basis)
    m = perfect_matching_in(edges)
    best_card = len(m)
    print(f"  start: dim={len(best_basis)} matchable={best_card}/{N//2}")
    improved = True
    while improved:
        improved = False
        for k in range(len(best_basis)):
            trial = best_basis[:k] + best_basis[k + 1 :]
            m = perfect_matching_in(edges_in_subspace(trial))
            if len(m) == N // 2:
                best_basis = trial
                improved = True
                print(f"  drop -> dim={len(best_basis)} still perfect")
                break
    return best_basis


def main():
    t0 = time.time()
    g = greedy_start()
    print(f"greedy: {cost_detail(g)} pairs={len(g)} ({time.time()-t0:.1f}s)")
    for w in (1.0, 0.375):
        t0 = time.time()
        best, bc = ils(g, budget=min(512 * N, 8 * N * N), w=w)
        print(f"ILS w={w}: cost={bc:.2f} detail={cost_detail(best)} "
              f"({time.time()-t0:.1f}s)")
        t0 = time.time()
        best3, bc3 = ils(g, budget=min(512 * N, 8 * N * N), w=w, use3=True)
        print(f"ILS3 w={w}: cost={bc3:.2f} detail={cost_detail(best3)} "
              f"({time.time()-t0:.1f}s)")
    # subspace approach seeded from the ILS result
    t0 = time.time()
    best, _ = ils(g, budget=8 * N * N, w=1.0)
    sb = anneal_subspace(best)
    edges = edges_in_subspace(sb)
    m = perfect_matching_in(edges)
    print(f"subspace: dim={len(sb)} matching={len(m)} detail={cost_detail(m)} "
          f"({time.time()-t0:.1f}s)")


if __name__ == "__main__":
    main()
