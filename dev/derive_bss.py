"""Derive a 7-term stabilizer decomposition of six T magic phases (BSS-style).

Target identity (over the six magic-spider values x in F2^6):

    prod_i w^{x_i} = sum_t c_t * [H_t x = b_t] * i^{mu_t . x} * (-1)^{x^T beta_t x}

with w = e^{i pi/4} and 7 terms — the stabilizer-rank-7 bound of
Bravyi/Smith/Smolin (PRX 6, 021043).  We do NOT transcribe any published
table: the decomposition is re-derived here from scratch by

  1. searching for a real decomposition of the |H>-state amplitudes
     t^{|x|} (t = sqrt(2)-1 = tan(pi/8)) as a combination of linear-code
     indicator states, using the S6 symmetry of the target to restrict to
     code-orbit sums,
  2. applying the exact single-qubit Clifford that maps (1, t) -> (1, w)
     per qubit, and
  3. canonicalizing each resulting stabilizer vector into
     (parity checks, i-linear phase, (-1)-quadratic phase, exact scalar).

All arithmetic is exact over Z[w, 1/sqrt(2)] (w^4 = -1).  The script
verifies the final identity pointwise over all 64 assignments and prints
the term table as Python source for tsim_tpu/zx/decompose.py.
"""

from __future__ import annotations

import itertools
from fractions import Fraction

import numpy as np

N = 6
NPTS = 1 << N


# ---------------------------------------------------------------------------
# exact ring Z[w] with dyadic denominators: a + b w + c w^2 + d w^3, w^8 = 1,
# w^4 = -1; elements stored as integer 4-vectors plus a power-of-sqrt2 exponent.
# ---------------------------------------------------------------------------


class Zw:
    __slots__ = ("v", "p")  # value = (v0 + v1 w + v2 w^2 + v3 w^3) * sqrt(2)^p

    def __init__(self, v=(0, 0, 0, 0), p=0):
        self.v = tuple(int(x) for x in v)
        self.p = int(p)
        self._norm()

    def _norm(self):
        # sqrt(2) = w - w^3: fold even factors of 2 out of the coefficients
        while self.v != (0, 0, 0, 0) and all(x % 2 == 0 for x in self.v):
            self.v = tuple(x // 2 for x in self.v)
            self.p += 2
        if self.v == (0, 0, 0, 0):
            self.p = 0

    def __add__(self, o):
        a, b = self, o
        if a.v == (0, 0, 0, 0):
            return b
        if b.v == (0, 0, 0, 0):
            return a
        # align sqrt2 exponents: multiply the higher-p one by sqrt2^(pa-pb)
        if a.p > b.p:
            a, b = b, a
        d = b.p - a.p
        bv = b.v
        for _ in range(d):
            bv = _mul_sqrt2(bv)
        return Zw(tuple(x + y for x, y in zip(a.v, bv)), a.p)

    def __neg__(self):
        return Zw(tuple(-x for x in self.v), self.p)

    def __sub__(self, o):
        return self + (-o)

    def __mul__(self, o):
        a0, a1, a2, a3 = self.v
        b0, b1, b2, b3 = o.v
        return Zw(
            (
                a0 * b0 - a1 * b3 - a2 * b2 - a3 * b1,
                a0 * b1 + a1 * b0 - a2 * b3 - a3 * b2,
                a0 * b2 + a1 * b1 + a2 * b0 - a3 * b3,
                a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0,
            ),
            self.p + o.p,
        )

    def mul_w(self, k):
        out = self.v
        for _ in range(k % 8):
            out = (-out[3], out[0], out[1], out[2])
        return Zw(out, self.p)

    def __eq__(self, o):
        d = self - o
        return d.v == (0, 0, 0, 0)

    def __hash__(self):
        return hash((self.v, self.p))

    def to_complex(self):
        w = np.exp(1j * np.pi / 4)
        return (
            (self.v[0] + self.v[1] * w + self.v[2] * w**2 + self.v[3] * w**3)
            * np.sqrt(2.0) ** self.p
        )

    def __repr__(self):
        return f"Zw({self.v}, sqrt2^{self.p})"


def _mul_sqrt2(v):
    # multiply coefficient 4-vector by sqrt(2) = w - w^3 (w^4 = -1)
    a0, a1, a2, a3 = v
    # (a0 + a1 w + a2 w^2 + a3 w^3)(w - w^3)
    #  = a0 w + a1 w^2 + a2 w^3 + a3 w^4  - a0 w^3 - a1 w^4 - a2 w^5 - a3 w^6
    return (a1 - a3, a0 + a2, a1 + a3, a2 - a0)


ZERO = Zw((0, 0, 0, 0))
ONE = Zw((1, 0, 0, 0))
W = Zw((0, 1, 0, 0))
I_ = Zw((0, 0, 1, 0))


def zw_ipow(k):
    return [ONE, I_, -ONE, -I_][k % 4]


def zw_wpow(k):
    return ONE.mul_w(k)


# ---------------------------------------------------------------------------
# step 1: real decomposition of t^{|x|} over linear-code indicators
# ---------------------------------------------------------------------------


def all_subspaces(n):
    """All linear subspaces of F2^n, each as a sorted tuple of point masks,
    enumerated via reduced-row-echelon forms."""
    out = []
    cols = list(range(n))
    for k in range(n + 1):
        for pivots in itertools.combinations(cols, k):
            free = [
                (r, c)
                for r in range(k)
                for c in range(pivots[r] + 1, n)
                if c not in pivots
            ]
            for bits in range(1 << len(free)):
                rows = [1 << (n - 1 - pivots[r]) for r in range(k)]
                for idx, (r, c) in enumerate(free):
                    if (bits >> idx) & 1:
                        rows[r] |= 1 << (n - 1 - c)
                pts = [0]
                for r in rows:
                    pts += [p ^ r for p in pts]
                out.append(tuple(sorted(pts)))
    return out


def perm_apply_mask(mask, perm, n):
    out = 0
    for i in range(n):
        if (mask >> (n - 1 - i)) & 1:
            out |= 1 << (n - 1 - perm[i])
    return out


def find_H_code_decomposition():
    """t^{|x|} = sum_j z_j * (sum over an S6-orbit of codes of indicators).

    Returns a list of (code_points_tuple, coeff float) pairs, <= 7 states.
    """
    subs = all_subspaces(N)
    index = {s: i for i, s in enumerate(subs)}
    perms = list(itertools.permutations(range(N)))

    # orbit partition under S6
    orbit_of = [-1] * len(subs)
    orbits = []
    for i, s in enumerate(subs):
        if orbit_of[i] >= 0:
            continue
        oid = len(orbits)
        members = set()
        for p in perms:
            t = tuple(sorted(perm_apply_mask(m, p, N) for m in s))
            members.add(index[t])
        for m in members:
            orbit_of[m] = oid
        orbits.append(sorted(members))

    t = np.sqrt(2) - 1
    popcnt = np.array([bin(x).count("1") for x in range(NPTS)])
    b = t**popcnt

    # orbit-sum columns
    cols = []
    for o in orbits:
        col = np.zeros(NPTS)
        for ci in o:
            for pt in subs[ci]:
                col[pt] += 1.0
        cols.append(col)
    A = np.array(cols).T  # 64 x n_orbits

    sizes = [len(o) for o in orbits]
    n_orb = len(orbits)
    # search small orbit subsets with total state count <= 7
    best = None
    order = sorted(range(n_orb), key=lambda i: sizes[i])
    for r in range(1, 5):
        for combo in itertools.combinations(order, r):
            tot = sum(sizes[i] for i in combo)
            if tot > 7 or (best and tot >= best[0]):
                continue
            M = A[:, combo]
            sol, res, rank, _ = np.linalg.lstsq(M, b, rcond=None)
            resid = np.linalg.norm(M @ sol - b)
            if resid < 1e-9:
                best = (tot, combo, sol)
    if best is None:
        return None, subs, orbits
    tot, combo, sol = best
    states = []
    for oi, z in zip(combo, sol):
        for ci in orbits[oi]:
            states.append((subs[ci], float(z)))
    return states, subs, orbits


# ---------------------------------------------------------------------------
# step 2/3: exact T-basis transform and canonical form fit
# ---------------------------------------------------------------------------


def exactify_coeff(z):
    """Represent float z as (a + b sqrt2)/2^k exactly (a, b, k integers)."""
    from fractions import Fraction

    s2 = np.sqrt(2)
    for k in range(0, 12):
        for bnum in range(-(1 << (k + 3)), 1 << (k + 3)):
            a = z * (1 << k) - bnum * s2
            if abs(a - round(a)) < 1e-7:
                return int(round(a)), bnum, k
    raise ValueError(f"cannot exactify {z}")


def main():
    states, subs, orbits = find_H_code_decomposition()
    if states is None:
        print("NO code-state decomposition found with <=7 states")
        return
    print(f"# |H>^6 decomposition: {len(states)} code states")
    for pts, z in states:
        print(f"#   dim={int(np.log2(len(pts)))} coeff={z:+.6f} code={pts[:4]}...")

    # exact |H> state vector: amplitude (sqrt2 - 1)^{|x|} * sqrt2^{|x|}
    # Work with the scaled target  b_x = (2 - sqrt2)^{|x|}  =  (sqrt2 t)^{|x|}
    # to stay in Z[w]:  sqrt2 - 1 is in Z[w] already: sqrt2 = w - w^3.
    S2 = Zw((0, 1, 0, -1))  # w - w^3 = sqrt(2)
    T_ = S2 - ONE  # sqrt2 - 1

    popcnt = [bin(x).count("1") for x in range(NPTS)]

    # exact coefficients for each code state
    exact_states = []
    for pts, z in states:
        a, bnum, k = exactify_coeff(z)
        cz = Zw((a, 0, 0, 0)) + Zw((bnum, 0, 0, 0)) * S2
        cz = Zw(cz.v, cz.p - 2 * k)  # divide by 2^k
        exact_states.append((pts, cz))

    # verify exactly: sum_j c_j [x in K_j] == t^{|x|}
    for x in range(NPTS):
        tot = ZERO
        for pts, cz in exact_states:
            if x in pts:
                tot = tot + cz
        want = ONE
        for _ in range(popcnt[x]):
            want = want * T_
        assert tot == want, (x, tot, want)
    print("# exact |H> identity verified on all 64 points")

    # Clifford map (1, t) -> (1, w), as an exact 2x2 matrix over Z[w, 1/sqrt2].
    # Need M [1, t]^T  proportional to [1, w]^T  with M mapping stabilizer
    # states to stabilizer states (M in the Clifford group up to scalar).
    # Bloch: |H> is (1/sqrt2)(X+Z)-axis; |T> is (1/sqrt2)(X+Y): the Clifford
    # fixing X and rotating Z->Y is S_X = e^{-i pi/4 X}, matrix
    # (1/sqrt2) [[1, -i], [-i, 1]].  Check: acts on (1, t):
    #   (1 - i t, -i + t) = (1 - i t) * (1, (t - i)/(1 - i t)).
    #   (t-i)/(1-it) for t = sqrt2-1:  numerically = w.  Verified below.
    M = [[ONE, -I_], [-I_, ONE]]  # times 1/sqrt2, tracked separately

    def apply_M_tensor(statevec):
        """Apply M per qubit (6 times) to an exact 64-vector."""
        v = statevec
        for q in range(N):
            nv = [ZERO] * NPTS
            bit = 1 << (N - 1 - q)
            for x in range(NPTS):
                if v[x] == ZERO:
                    continue
                x0, x1 = x & ~bit, x | bit
                if x & bit:
                    nv[x0] = nv[x0] + M[0][1] * v[x]
                    nv[x1] = nv[x1] + M[1][1] * v[x]
                else:
                    nv[x0] = nv[x0] + M[0][0] * v[x]
                    nv[x1] = nv[x1] + M[1][0] * v[x]
            v = nv
        return [Zw(e.v, e.p - N) for e in v]  # the 6 factors of 1/sqrt2

    # sanity: M applied to |H> product state gives (1, w)^{tensor 6} * scale
    hvec = [ONE] * NPTS
    for x in range(NPTS):
        e = ONE
        for _ in range(popcnt[x]):
            e = e * T_
        hvec[x] = e
    tvec = apply_M_tensor(hvec)
    # global scale = tvec[0]; target w^{|x|}
    scale = tvec[0]
    ok = all(tvec[x] == scale.mul_w(popcnt[x]) for x in range(NPTS))
    print(f"# Clifford map check: {ok}, scale={scale}")
    assert ok

    # transform each code state, divide by scale, fit canonical form
    print("\nBSS6_TERMS = [")
    fitted = []
    for pts, cz in exact_states:
        vec = [ZERO] * NPTS
        for p in pts:
            vec[p] = cz
        tv = apply_M_tensor(vec)
        # divide by scale: scale is a unit times power of sqrt2?  Instead of
        # dividing, multiply the *target* check by scale; for emission we
        # need c_t with  sum_t term_t(x) = w^{|x|},  i.e. work with
        # tv'_x = tv_x / scale.  Do exact division by solving on the fly:
        # scale = u * sqrt2^p with u a unit in Z[w] (|u|=1): find u.
        tvn = exact_divide_vec(tv, scale)
        fit = fit_canonical(tvn)
        fitted.append(fit)
        print("    " + format_term(fit) + ",")
    print("]")

    # final exact verification of the emitted identity
    for x in range(NPTS):
        tot = ZERO
        for Hrows, bbits, mu, beta, c in fitted:
            ok = all(
                (bin(h & x).count("1") + bb) % 2 == 0 for h, bb in zip(Hrows, bbits)
            )
            if not ok:
                continue
            ip = sum(mu[i] for i in range(N) if (x >> (N - 1 - i)) & 1)
            qp = sum(
                1
                for (i, j) in beta
                if ((x >> (N - 1 - i)) & 1) and ((x >> (N - 1 - j)) & 1)
            )
            tot = tot + c * zw_ipow(ip) * (ONE if qp % 2 == 0 else -ONE)
        assert tot == zw_wpow(popcnt[x]), (x, tot)
    print("# FINAL identity verified: sum of 7 terms == w^{|x|} on all 64 points")


def exact_divide_vec(vec, scale):
    """Divide every entry by scale, where scale = unit * sqrt2^p."""
    # find k, p with scale == w^k * sqrt2^p  (true for our construction)
    for k in range(8):
        cand = zw_wpow(k)
        for p in range(-24, 25):
            if Zw(cand.v, cand.p + p) == scale:
                inv = zw_wpow((8 - k) % 8)
                return [Zw((e * inv).v, (e * inv).p - p) for e in vec]
    # general unit u: u * conj(u) = 1 => inverse is conjugate times sign
    raise ValueError(f"scale {scale} is not w^k sqrt2^p")


def fit_canonical(vec):
    """Fit vec_x = c * [H x = b] * i^{mu.x} * (-1)^{sum beta x_i x_j}."""
    support = [x for x in range(NPTS) if not vec[x] == ZERO]
    assert support, "empty state"
    # support must be an affine subspace: a + span(G)
    a = support[0]
    diffs = sorted({x ^ a for x in support})
    # GF(2) basis of diffs
    basis = []
    for d in diffs:
        r = d
        for bvec in basis:
            r = min(r, r ^ bvec)
        if r:
            basis.append(r)
    dim = len(basis)
    assert len(support) == 1 << dim, "support not affine"
    # checks: rows h with h.x = h.a for all x in support
    Hrows, bbits = [], []
    span = {0}
    for bvec in basis:
        span |= {s ^ bvec for s in span}
    for h in range(1, NPTS):
        if all(bin(h & bvec).count("1") % 2 == 0 for bvec in basis):
            # keep an independent set only
            r = h
            for prev in Hrows:
                r = min(r, r ^ prev)
            if r:
                Hrows.append(h)
                bbits.append(bin(h & a).count("1") % 2)
    assert len(Hrows) == N - dim

    # fit mu (mod 4) and beta (mod 2) on x-coordinates directly by greedy
    # elimination: order support by weight and solve.
    # unknowns: c (Zw), mu_0..5 in Z4, beta_{ij} in Z2 (15) — solve by
    # evaluating on convenient points: use the affine parametrization.
    c = vec[a]
    # represent each support point as a (sorted) combination of basis vecs
    # fit over nu-space then expand xor-forms to x-forms
    # nu coordinates: x = a ^ xor(basis[j] for j in J)
    from itertools import combinations

    nmu = {}
    for j, bv in enumerate(basis):
        x = a ^ bv
        # vec_x / c is a power of i times +-1: identify i-exponent k_j
        nmu[j] = _ipow_of(vec[x], c)
    nbeta = {}
    for j, k in combinations(range(dim), 2):
        x = a ^ basis[j] ^ basis[k]
        kk = _ipow_of(vec[x], c)
        nbeta[(j, k)] = ((kk - nmu[j] - nmu[k]) // 2) % 2
        assert (kk - nmu[j] - nmu[k]) % 2 == 0, "non-quadratic phase"
    # verify on all support points (in nu space)
    for x in support:
        J = _coords(x ^ a, basis)
        k = sum(nmu[j] for j in J) + 2 * sum(
            nbeta[(min(j, kk), max(j, kk))]
            for j, kk in combinations(J, 2)
        )
        assert vec[x] == c * zw_ipow(k), "canonical fit failed"

    # expand from nu to x coordinates:
    #   nu_j(x) = parity((x ^ a) & R_j)  where R_j: dual basis rows
    # Build dual: find rows R_j with parity(R_j & basis[k]) = delta_jk and
    # parity(R_j & h) arbitrary for check rows (choose any solution).
    R = _dual_rows(basis)
    # i^{sum_j nmu_j nu_j(x)} (-1)^{...}: expand each nu_j = a_j xor l_j(x)
    # where l_j(x) = parity(R_j & x), a_j = parity(R_j & a).
    # Work symbolically over (const k0 mod 4, mu[i] mod 4, beta set):
    k0 = 0
    mu = [0] * N
    beta = set()

    def add_linear_i(mult, Rj, aj):
        # multiply i^{mult * (aj xor parity(Rj & x))}
        nonlocal k0, mu, beta
        bits = [i for i in range(N) if (Rj >> (N - 1 - i)) & 1]
        # parity = sum - 2*sum_pairs (mod 4): i^{m*parity} =
        #   prod_i i^{m x_i} * prod_{i<j} i^{-2 m x_i x_j}
        m = mult % 4
        if aj:
            # i^{m*(1 xor p)} = i^m * i^{-m p} * ... careful: 1 xor p = 1 + p - 2p
            # i^{m(1 xor p)} = i^m i^{mp} i^{-2mp} = i^m i^{-m p}? check p=1:
            # lhs i^0=1; rhs i^m i^{-m} = 1 ok. p=0: i^m both. so:
            k0 += m
            m = (-m) % 4
        for i in bits:
            mu[i] = (mu[i] + m) % 4
        if m % 2 == 1 or m % 4 == 2:
            # i^{m * parity(S)} with parity = |x_S| mod 2:
            # i^{m*parity} = prod i^{m x_i} * (-1)^{m * sum_{i<j} x_i x_j}
            pass
        mm = m % 4
        if mm:
            for ii, jj in itertools.combinations(bits, 2):
                # from parity = sum - 2 sum_pairs + 4(...): i^{m*parity}
                # = prod i^{m x_i} * i^{-2m sum pairs} ; i^{-2m} = (-1)^m
                if mm % 2 == 1:
                    _flip(beta, ii, jj)
                elif mm == 2:
                    pass  # i^{-4 sum} = 1
        return

    def _flip(bset, i, j):
        key = (min(i, j), max(i, j))
        if key in bset:
            bset.remove(key)
        else:
            bset.add(key)

    for j in range(dim):
        aj = bin(R[j] & a).count("1") % 2
        add_linear_i(nmu[j], R[j], aj)
    # quadratic nu terms: (-1)^{nbeta_jk nu_j nu_k}: nu_j nu_k =
    # (aj xor lj)(ak xor lk) — expand into x-space quadratics:
    for (j, k), bb in nbeta.items():
        if not bb:
            continue
        aj = bin(R[j] & a).count("1") % 2
        ak = bin(R[k] & a).count("1") % 2
        # (-1)^{(aj xor lj)(ak xor lk)}: expand product over xor:
        # u v with u = aj + lj - 2 aj lj etc; mod 2: (aj xor lj)(ak xor lk)
        # = aj ak xor aj lk xor ak lj xor lj lk  (mod 2, since product of
        # 0/1 values: xor expansion valid as both sides in {0,1} — check:
        # it's multiplication in F2 of two affine forms; distributes.)
        if aj and ak:
            k0 += 2  # (-1)^1 constant when both...: handled via k0 mod 4: (-1) = i^2
        lj_bits = [i for i in range(N) if (R[j] >> (N - 1 - i)) & 1]
        lk_bits = [i for i in range(N) if (R[k] >> (N - 1 - i)) & 1]
        if ak:
            for i in lj_bits:
                mu[i] = (mu[i] + 2) % 4
        if aj:
            for i in lk_bits:
                mu[i] = (mu[i] + 2) % 4
        # lj * lk = parity(Rj&x) * parity(Rk&x): product of two parities is
        # NOT a single quadratic monomial — expand:
        # parity(S) * parity(T) = sum_{i in S, j in T} x_i x_j (mod 2)
        # with x_i x_i = x_i.
        for ii in lj_bits:
            for jj in lk_bits:
                if ii == jj:
                    mu[ii] = (mu[ii] + 2) % 4
                else:
                    _flip(beta, ii, jj)
    c = c * zw_ipow(k0)
    fit = (tuple(Hrows), tuple(bbits), tuple(mu), tuple(sorted(beta)), c)
    # verify the x-space form against vec on ALL points
    for x in range(NPTS):
        okchk = all(
            (bin(h & x).count("1") + bb) % 2 == 0
            for h, bb in zip(Hrows, bbits)
        )
        ip = sum(mu[i] for i in range(N) if (x >> (N - 1 - i)) & 1)
        qp = sum(
            1 for (i, j) in beta
            if ((x >> (N - 1 - i)) & 1) and ((x >> (N - 1 - j)) & 1)
        )
        want = c * zw_ipow(ip + 2 * (qp % 2)) if okchk else ZERO
        assert vec[x] == want, (x, vec[x], want, fit)
    return fit


def _ipow_of(val, c):
    for k in range(4):
        if val == c * zw_ipow(k):
            return k
    raise ValueError("ratio not a power of i")


def _coords(d, basis):
    J = []
    r = d
    for j in range(len(basis) - 1, -1, -1):
        # basis vectors from GF(2) elimination: reduce greedily
        pass
    # simple: try all subsets (dim <= 6)
    for rbits in range(1 << len(basis)):
        acc = 0
        for j in range(len(basis)):
            if (rbits >> j) & 1:
                acc ^= basis[j]
        if acc == d:
            return [j for j in range(len(basis)) if (rbits >> j) & 1]
    raise ValueError("not in span")


def _dual_rows(basis):
    """Rows R_j with parity(R_j & basis[k]) = [j == k]."""
    dim = len(basis)
    R = []
    for j in range(dim):
        found = None
        for r in range(NPTS):
            if all(
                bin(r & basis[k]).count("1") % 2 == (1 if k == j else 0)
                for k in range(dim)
            ):
                found = r
                break
        assert found is not None
        R.append(found)
    return R


def format_term(fit):
    Hrows, bbits, mu, beta, c = fit
    return (
        f"(checks={list(zip(Hrows, bbits))}, mu={list(mu)}, "
        f"beta={list(beta)}, c=Zw{c.v}, p2={c.p})"
    )


if __name__ == "__main__":
    main()
