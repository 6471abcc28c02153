"""Derive stabilizer decompositions of magic-phase tensors numerically.

We decompose the function f(x) = prod_j w^{x_j} over x in {0,1}^n (the joint
contribution of n pi/4 phases) into a small sum of "stabilizer factors":

  P(theta):    prod_j e^{i theta x_j}            (uniform extra phases)
  E(phi):      1 + e^{i phi} (-1)^{sum x}        (X-hub phase gadget, all n)
  K(phi):      [all x equal] e^{i phi x}         (Z-hub equality / GHZ)
  G_S(phi):    1 + e^{i phi} (-1)^{sum_{j in S} x}   (gadget on subset S)
  PS_j(theta): e^{i theta x_j}                   (single-vertex phase)

plus products of one P with one E. Coefficients are solved by least squares
on the 2^n value table and verified exactly; exact dyadic forms are
extracted by lattice rounding in Z[w] * 2^(k/2).

Also derives cat_k decompositions: target (1 + w (-1)^{sum x}) (the magic
phase gadget over k spiders).
"""
import itertools
import sys

import numpy as np

W = np.exp(1j * np.pi / 4)


def bits(n):
    return np.array(list(itertools.product([0, 1], repeat=n)))


def target_T(n):
    x = bits(n)
    return W ** x.sum(1)


def target_cat(n, leaf_phase=np.pi / 4):
    x = bits(n)
    return 1 + np.exp(1j * leaf_phase) * (-1.0) ** x.sum(1)


def candidates(n):
    x = bits(n)
    cands = {}
    for t in range(4):
        th = t * np.pi / 2
        cands[("P", t)] = np.exp(1j * th * x.sum(1))
    for p in range(4):
        ph = p * np.pi / 2
        cands[("E", p)] = 1 + np.exp(1j * ph) * (-1.0) ** x.sum(1)
    for p in range(4):
        ph = p * np.pi / 2
        alleq = (x.sum(1) == 0) | (x.sum(1) == n)
        cands[("K", p)] = alleq * np.exp(1j * ph * (x.sum(1) == n))
    # P x E combos
    for t in range(1, 4):
        for p in range(4):
            cands[("PE", t, p)] = cands[("P", t)] * cands[("E", p)]
    # gadgets on (n-1)-subsets
    for j in range(n):
        sub = [k for k in range(n) if k != j]
        for p in range(4):
            cands[("G", j, p)] = 1 + np.exp(1j * p * np.pi / 2) * (-1.0) ** x[:, sub].sum(1)
        # subset gadget with extra phase on the excluded vertex
        for t in range(1, 4):
            for p in range(4):
                cands[("GT", j, p, t)] = cands[("G", j, p)] * np.exp(1j * t * np.pi / 2 * x[:, j])
    return cands


def to_exact(c, tol=1e-8):
    """Express complex c as (a + b w + c2 i + d w^3) / 2^m, return (m,(a,b,c2,d)) or None."""
    for m in range(0, 12):
        v = c * (2 ** m)
        # solve integer combination: v = a + b w + c2 i + d w3
        # basis real/imag: 1=(1,0), w=(s,s), i=(0,1), w3=(-s,s), s=sqrt(1/2)
        s = np.sqrt(0.5)
        A = np.array([[1, s, 0, -s], [0, s, 1, s]])
        sol, *_ = np.linalg.lstsq(A, np.array([v.real, v.imag]), rcond=None)
        r = np.round(sol)
        if np.allclose(A @ r, [v.real, v.imag], atol=tol):
            return m, tuple(int(t) for t in r)
    return None


def solve(names, cands, target, tol=1e-9):
    M = np.stack([cands[nm] for nm in names], axis=1)
    sol, res, rank, _ = np.linalg.lstsq(M, target, rcond=None)
    err = np.abs(M @ sol - target).max()
    return sol, err


def search(n, target, max_terms=7, pool_filter=None):
    cands = candidates(n)
    names = list(cands)
    if pool_filter:
        names = [nm for nm in names if pool_filter(nm)]
    # greedy-ish: try full lstsq on pool, then prune
    sol, err = solve(names, cands, target)
    if err > 1e-9:
        print(f"n={n}: pool cannot represent target (err={err:.2e})")
        return None
    # prune smallest coefficients iteratively
    active = list(names)
    while len(active) > max_terms:
        sols, _ = solve(active, cands, target)
        order = np.argsort(np.abs(sols))
        removed = False
        for idx in order:
            trial = [nm for k, nm in enumerate(active) if k != idx]
            s2, e2 = solve(trial, cands, target)
            if e2 < 1e-9:
                active = trial
                removed = True
                break
        if not removed:
            print(f"n={n}: stuck at {len(active)} terms")
            break
    sols, err = solve(active, cands, target)
    out = []
    for nm, c in zip(active, sols):
        if abs(c) < 1e-12:
            continue
        exact = to_exact(c)
        out.append((nm, c, exact))
    print(f"n={n}: {len(out)} terms, err={err:.2e}")
    for nm, c, exact in out:
        print(f"   {nm}: {c:.6f}  exact={exact}")
    return out


if __name__ == "__main__":
    print("=== T^2 pair ===")
    search(2, target_T(2), max_terms=2)
    print("=== T^6 BSS ===")
    search(6, target_T(6), max_terms=7)
    for k in (3, 4, 5, 6):
        print(f"=== cat_{k} (gadget with T leaf over {k} spiders) ===")
        search(k, target_cat(k), max_terms=4)
