"""Subspace-guided min-rank perfect matching search (rung-12 instance).

Iterates: matching -> basis -> try dropping basis vectors (blossom test)
-> new matching -> recompute basis; with randomized restarts and
annealing over generator swaps.
"""
import pickle
import random
import sys
import time

import networkx as nx

with open("/tmp/plan_inputs.pkl", "rb") as fh:
    D = pickle.load(fh)

N = D["n"]
U = D["umask"]
LH = D["lhmask"]
DM = D["dmask"]
ALLOWED = sorted(D["allowed"])
ALLOWED_SET = set(ALLOWED)
DIFF = {(i, j): U[i] ^ U[j] for (i, j) in ALLOWED}


def reduce_v(v, basis):
    for b in basis:
        w = v ^ b
        if w < v:
            v = w
    return v


def basis_of(vecs):
    basis = []
    for v in vecs:
        v = reduce_v(v, basis)
        if v:
            basis.append(v)
            basis.sort(reverse=True)
    return basis


def drops_of(pairs):
    lh = 0
    for (i, j) in pairs:
        lh |= LH[i] | LH[j]
    d = 0
    for (i, j) in pairs:
        own = LH[i] | LH[j]
        if DM[(i, j)] & lh & ~own:
            d += 1
    return d


def covered_edges(basis):
    return [e for e in ALLOWED if reduce_v(DIFF[e], basis) == 0]


def max_matching(edges, rnd=None):
    G = nx.Graph()
    G.add_nodes_from(range(N))
    G.add_edges_from(edges)
    m = nx.max_weight_matching(G, maxcardinality=True)
    return [tuple(sorted(p)) for p in m]


def iterate_down(pairs, rnd, max_rounds=60):
    """matching -> basis -> drop-test loop until fixpoint."""
    best_pairs = list(pairs)
    basis = basis_of([DIFF[p] for p in best_pairs])
    for _ in range(max_rounds):
        improved = False
        order = list(range(len(basis)))
        rnd.shuffle(order)
        for k in order:
            trial = [basis[t] for t in range(len(basis)) if t != k]
            m = max_matching(covered_edges(trial))
            if len(m) == N // 2:
                # re-derive the basis from the matching itself (may shrink)
                basis = basis_of([DIFF[p] for p in m])
                best_pairs = m
                improved = True
                break
        if not improved:
            break
    return best_pairs, basis


def random_perfect_matching(rnd):
    for _ in range(200):
        edges = list(ALLOWED)
        rnd.shuffle(edges)
        w = {e: rnd.random() for e in edges}
        G = nx.Graph()
        G.add_nodes_from(range(N))
        for e in edges:
            G.add_edge(*e, weight=w[e])
        m = nx.max_weight_matching(G, maxcardinality=True)
        if len(m) == N // 2:
            return [tuple(sorted(p)) for p in m]
    return None


def main():
    seeds = [int(s) for s in sys.argv[1:]] or list(range(8))
    overall = None
    for seed in seeds:
        rnd = random.Random(seed)
        t0 = time.time()
        m0 = random_perfect_matching(rnd)
        if m0 is None:
            print(f"seed {seed}: no perfect matching found")
            continue
        pairs, basis = iterate_down(m0, rnd)
        r = len(basis)
        d = drops_of(pairs)
        print(f"seed {seed}: rank={r} drops={d} ({time.time()-t0:.1f}s)",
              flush=True)
        if overall is None or (r + 0.375 * d) < overall[0]:
            overall = (r + 0.375 * d, r, d, pairs)
    if overall:
        _, r, d, pairs = overall
        print(f"BEST: rank={r} drops={d}")
        with open("/tmp/plan_subspace_best.pkl", "wb") as fh:
            pickle.dump(pairs, fh)


if __name__ == "__main__":
    main()
