"""Derive an exact 6T -> 7-term stabilizer decomposition (BSS-style).

Target: F(x) = w^{|x|} on {0,1}^6 (amplitudes of |T>^{x6}, |T> = |0> + w|1>),
as  F = sum_{k=1}^{7} c_k phi_k  with stabilizer phi_k.

Structure argument (drives the search):
  * Symmetric stabilizer states span only a 6-dim subspace of the 7-dim
    symmetric function space: products z^{|x|} (4), GHZ-type delta_0 +
    i^b delta_6 (2 more).  The missing direction is odd-weight-supported
    and ANTI-symmetric under global bit flip.
  * So a 7-term decomposition needs >= 2 non-symmetric states whose
    asymmetric parts cancel; 5 symmetric + 1 canceling pair = 7.

Search: pool of stabilizer functions phi = [parity sel] * i^{a.x} *
(-1)^{Q(x)} for small quadratics Q; find pairs with parallel asymmetric
parts; solve the remaining 6-dim symmetric system.
"""
import itertools

import numpy as np

W = np.exp(1j * np.pi / 4)
N = 6
XS = np.array(list(itertools.product((0, 1), repeat=N)))  # (64, 6)
WT = XS.sum(1)
F = W**WT  # target

# --- symmetric subspace machinery -----------------------------------------
SYM_BASIS = np.stack([(WT == w).astype(float) for w in range(7)], 1)  # 64x7


def sym_part(v):
    """Project onto symmetric subspace; return (64,) sym part and (7,) weight fn."""
    out = np.zeros_like(v)
    wf = np.zeros(7, complex)
    for w in range(7):
        m = WT == w
        avg = v[m].mean()
        wf[w] = avg
        out[m] = avg
    return out, wf


def asym_part(v):
    s, _ = sym_part(v)
    return v - s


# --- candidate pool ---------------------------------------------------------
def phi_vec(parity, a, edges):
    """parity: None/0/1 ; a: (6,) ints mod 4 ; edges: list of (i,j)."""
    q = np.zeros(64, int)
    for (i, j) in edges:
        q += XS[:, i] * XS[:, j]
    v = (1j ** (XS @ a)) * ((-1.0) ** q)
    if parity is not None:
        v = v * (WT % 2 == parity)
    return v.astype(complex)


def build_pool():
    pool = []
    pairs_ij = list(itertools.combinations(range(6), 2))
    matchings = []
    for m in itertools.permutations(range(6)):
        mm = tuple(sorted(tuple(sorted((m[2 * k], m[2 * k + 1]))) for k in range(3)))
        if mm not in matchings:
            matchings.append(mm)
    quad_sets = (
        [()]
        + [(e,) for e in pairs_ij]
        + [tuple(m) for m in matchings]
        + [tuple(itertools.combinations(s, 2)) for s in itertools.combinations(range(6), 3)]
        + [tuple(pairs_ij)]  # K6
    )
    a_choices = [np.full(6, k) for k in range(4)]
    # a supported on a subset (break symmetry in the linear part too)
    for s in itertools.combinations(range(6), 3):
        for k in (1, 2, 3):
            a = np.zeros(6, int)
            a[list(s)] = k
            a_choices.append(a)
    for parity in (None, 0, 1):
        for edges in quad_sets:
            for a in a_choices:
                pool.append(((parity, tuple(a), edges), phi_vec(parity, a, edges)))
    return pool


def main():
    pool = build_pool()
    print("pool size", len(pool))
    # keep only candidates with nonzero asym part & nonzero missing-dir sym
    cands = []
    for meta, v in pool:
        av = asym_part(v)
        na = np.linalg.norm(av)
        _, wf = sym_part(v)
        missing = wf[1] - wf[5]  # flip-odd odd-support component proxy
        if na > 1e-9 and abs(missing) > 1e-9:
            cands.append((meta, v, av / na, na, wf))
    print("asym cands", len(cands))

    # symmetric family as weight functions (7-dim space coords)
    zpow = {z: np.array([z**w for w in range(7)]) for z in (1, 1j, -1, -1j)}
    sym_fam = [("one", zpow[1]), ("i^w", zpow[1j]), ("(-1)^w", zpow[-1]),
               ("(-i)^w", zpow[-1j]),
               ("G0", np.array([1, 0, 0, 0, 0, 0, 1], complex)),
               ("G1", np.array([1, 0, 0, 0, 0, 0, 1j], complex)),
               ("G2", np.array([1, 0, 0, 0, 0, 0, -1], complex)),
               ("G3", np.array([1, 0, 0, 0, 0, 0, -1j], complex))]
    Ftgt = W ** np.arange(7)

    hits = []
    for i in range(len(cands)):
        mi, vi, ui, nai, wfi = cands[i]
        for j in range(i + 1, len(cands)):
            mj, vj, uj, naj, wfj = cands[j]
            # asym cancellation: u_i parallel to u_j
            ip = np.vdot(ui, uj)
            if abs(abs(ip) - 1.0) > 1e-9:
                continue
            # asym_j = naj * uj = naj * ip * ui (ip = <ui,uj> phase):
            # c_i*nai*ui + c_j*naj*ip*ui = 0  ->  lam = c_j/c_i:
            lam = -nai / (naj * ip)
            # pair weight function: wfi + lam*wfj  (up to overall c_i)
            S = wfi + lam * wfj
            # need S to carry the missing direction: coefficient on (1,0,-1)
            # over odd points with basis (1,1,1),(1,-1,1),(1,0,-1):
            gamma = (S[1] - S[5]) / 2
            if abs(gamma) < 1e-9:
                continue
            # choose c so that c*gamma matches F's missing coeff (= w):
            c = W / gamma
            rest = Ftgt - c * S
            # rest must be solvable with FIVE of the sym family
            for combo in itertools.combinations(range(8), 5):
                M = np.stack([sym_fam[k][1] for k in combo], 1)
                sol, res, rank, _ = np.linalg.lstsq(M, rest, rcond=None)
                r = np.linalg.norm(M @ sol - rest)
                if r < 1e-8:
                    # full 64-point verification
                    full = c * vi + c * lam * vj
                    for k, s in zip(combo, sol):
                        wf = sym_fam[k][1]
                        full = full + s * wf[WT]
                    if np.abs(full - F).max() > 1e-8:
                        continue
                    coeffs = [c, c * lam] + list(sol)
                    snaps = [snap(z) for z in coeffs]
                    if all(s is not None for s in snaps):
                        print("DYADIC HIT:")
                        print("  phi1", mi, "coeff", c, snaps[0])
                        print("  phi2", mj, "coeff", c * lam, snaps[1])
                        for k, s, sn in zip(combo, sol, snaps[2:]):
                            print("  ", sym_fam[k][0], s, sn)
                        hits.append((mi, mj, c, c * lam, combo, sol))
                        if len(hits) >= 8:
                            return hits
    print("hits:", len(hits))
    return hits


def snap(z, kmax=10):
    """z = (a + b*sqrt2 + i*(c + d*sqrt2)) / 2^k with ints, else None."""
    s2 = np.sqrt(2.0)
    for k in range(kmax):
        m = 2**k
        for part in ():
            pass
        def split(x):
            for v in range(-512, 513):
                u = x - v * s2
                if abs(u - round(u)) < 1e-7:
                    return int(round(u)), v
            return None
        r = split(z.real * m)
        im = split(z.imag * m)
        if r and im:
            return (r, im, k)
    return None


if __name__ == "__main__":
    main()
