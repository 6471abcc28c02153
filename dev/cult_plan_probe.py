"""Planned joint pair-projector decomposition probe.

Plan a min-rank perfect matching of ALL magic gadgets once (after
gadgetizing plain T spiders), enumerate only the GF(2)-consistent branch
assignments, execute every split per assignment without intermediate
reduction, then reduce each leaf once.
"""
import sys, time, random, itertools
sys.path.insert(0, "/root/repo"); sys.path.insert(0, "/root/repo/dev")
import cult_decomp_probe as cp
from tsim_tpu.zx.decompose import _t_vertices, tcount, split_gadget_pair_projector
from tsim_tpu.zx.simplify import full_reduce, set_shake
from tsim_tpu.compile.stabrank import merge_parallel_graphs, find_stab_magic
from fractions import Fraction

set_shake(False)

def reduce_vec(basis, vec):
    v = set(vec)
    while v:
        piv = max(v, key=str)
        if piv in basis: v ^= basis[piv]
        else: return piv, v
    return None, v

def plan_matching(g, gads, seed):
    rng = random.Random(seed)
    n = len(gads)
    allowed = []
    for i in range(n):
        l1,h1,t1 = gads[i]
        for j in range(i+1, n):
            l2,h2,t2 = gads[j]
            ok, conj, eqp = cp._pair_ok(g,l1,h1,t1,l2,h2,t2,strict=False)
            if ok:
                allowed.append((i,j,frozenset(cp._pairvec(g,h1,t1,h2,t2))))
    rng.shuffle(allowed)
    unmatched = set(range(n)); basis = {}; chosen = []
    while len(unmatched) > 1:
        best = None
        for (i,j,vec) in allowed:
            if i not in unmatched or j not in unmatched: continue
            piv, v = reduce_vec(basis, vec)
            key = (0 if piv is None else 1, len(v))
            if best is None or key < best[0]:
                best = (key,i,j,piv,v,vec)
                if key[0]==0 and key[1]==0: break
        if best is None: break
        _,i,j,piv,v,vec = best
        if piv is not None: basis[piv]=v
        chosen.append((i,j,vec))
        unmatched -= {i,j}
    return chosen, unmatched

def consistent_assignments(vectors):
    """vectors: list of frozensets (full vertex+param coords).
    Returns list of c-tuples covering exactly the consistent branch space."""
    basis = {}          # pivot -> (reduced vec, expr as frozenset of free indices)
    free = []           # indices of independent pairs
    exprs = []          # per pair: ('free', k) or ('dep', frozenset of free idxs)
    for idx, vec in enumerate(vectors):
        v = set(vec); expr = set()
        while v:
            piv = max(v, key=str)
            if piv in basis:
                bv, be = basis[piv]
                v ^= bv; expr ^= be
            else:
                basis[piv] = (frozenset(v), frozenset(expr | {len(free)}))
                exprs.append(('free', len(free)))
                free.append(idx)
                break
        else:
            exprs.append(('dep', frozenset(expr)))
    out = []
    for bits in itertools.product((0,1), repeat=len(free)):
        c = []
        for kind, e in exprs:
            if kind == 'free': c.append(bits[e])
            else: c.append(sum(bits[k] for k in e) & 1)
        out.append(tuple(c))
    return out

def apply_split_inplace(g, l1, h1, l2, h2, c):
    """One branch of split_gadget_pair_projector, mutating g."""
    from tsim_tpu.zx.graph import Z, HADAMARD
    a1 = g.phase(l1); a2 = g.phase(l2)
    P1 = frozenset(g.get_params(l1)); P2 = frozenset(g.get_params(l2))
    Q1 = frozenset(g.get_params(h1)); Q2 = frozenset(g.get_params(h2))
    T1 = set(g.neighbors(h1)) - {l1}
    T2 = set(g.neighbors(h2)) - {l2}
    D = T1 ^ T2
    g.remove_vertex(l1); g.remove_vertex(h1)
    g.set_phase(l2, ((a1 + a2) if c == 0 else (a2 - a1)) % 2)
    g.set_params(l2, P1 ^ P2)
    hub = g.add_vertex(Z, qubit=g.qubit(h2)-0.5, row=g.row(h2), phase=Fraction(c))
    g.set_params(hub, Q1 ^ Q2)
    for t in D:
        g.add_edge((hub, t), HADAMARD)
    g.scalar.add_power(len(D) - len(T1) - 1)
    if c == 1:
        g.scalar.add_phase(a1)
        if P1: g.scalar.add_pi_var(P1)

def planned_decompose(g, restarts=20):
    g = g.copy()
    cp._gadgetize_plain_ts(g)
    ts = _t_vertices(g)
    gads = cp._gadgets(g, ts)
    best = None
    for s in range(restarts):
        chosen, unmatched = plan_matching(g, gads, s)
        # validity: no pair's D may contain another chosen pair's l or h
        lh = set()
        for (i,j,_) in chosen:
            lh |= {gads[i][0], gads[i][1], gads[j][0], gads[j][1]}
        valid = []
        for (i,j,vec) in chosen:
            D = {x for x in vec if not (isinstance(x, tuple) and x[0]=="param")}
            if D & lh - {gads[i][0],gads[i][1],gads[j][0],gads[j][1]} & D:
                continue
            if D & (lh - {gads[i][0],gads[i][1],gads[j][0],gads[j][1]}):
                continue
            valid.append((i,j,vec))
        # rank of valid
        basis = {}
        r = 0
        for (_,_,vec) in valid:
            piv, v = reduce_vec(basis, vec)
            if piv is not None: basis[piv]=v; r+=1
        score = (r, len(gads) - 2*len(valid))
        if best is None or score < best[0]:
            best = (score, valid, unmatched)
    (r, leftover_ct), valid, unmatched = best
    print(f"plan: {len(valid)} pairs, rank {r}, leftover gadget slots {leftover_ct}")
    assigns = consistent_assignments([vec for (_,_,vec) in valid])
    print(f"consistent assignments: {len(assigns)}")
    leaves = []
    t0 = time.perf_counter()
    for c in assigns:
        gg = g.copy()
        for (i,j,vec), cb in zip(valid, c):
            apply_split_inplace(gg, gads[i][0], gads[i][1], gads[j][0], gads[j][1], cb)
        full_reduce(gg, paramSafe=True)
        if gg.scalar.is_zero: continue
        leaves.append(gg)
    print(f"exec+reduce {time.perf_counter()-t0:.1f}s; nonzero leaves {len(leaves)}; residual tcounts {sorted(set(tcount(x) for x in leaves))}")
    # recurse residual magic through the standard machinery
    final = find_stab_magic(leaves, strategy="cat5")
    final = merge_parallel_graphs(final)
    print(f"final terms {len(final)}")
    return final

if __name__ == "__main__":
    g = cp.build()
    t0 = time.perf_counter()
    planned_decompose(g)
    print(f"total {time.perf_counter()-t0:.0f}s")
