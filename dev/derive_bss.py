"""Derive a 7-term stabilizer decomposition of |T>^x6 (BSS rank).

Candidates: full-support 6-qubit stabilizer states
    psi_{A,b}(x) = i^{b.x} (-1)^{x^T A x},  A upper-triangular in F_2^{6x6},
    b in Z_4^6
(graph states with S^b local diagonals). All have |psi(x)|=1, so OMP
correlation ranking needs no norm correction; the sweep over all
2^15 * 4^6 candidates is two f32 GEMMs (run through XLA CPU — numpy's
BLAS in this image is unthreaded).
"""

import itertools
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

N = 6
W = np.exp(1j * np.pi / 4)
X = np.array(list(itertools.product([0, 1], repeat=N)))  # (64, 6) MSB-first
target = W ** X.sum(axis=1)  # |T>^x6 amplitudes (unnormalized)

PAIRS = [(i, j) for i in range(N) for j in range(i + 1, N)]  # 15
PAIR_COLS = np.stack([X[:, i] * X[:, j] for (i, j) in PAIRS], axis=1)  # (64,15)
NA = 1 << 15
A_BITS = (np.arange(NA)[None, :] >> np.arange(15)[:, None]) & 1  # (15, NA)
SIGNS = ((-1.0) ** (PAIR_COLS @ A_BITS % 2)).astype(np.float32)  # (64, NA)

# b-transform operator: F[b_flat, x] = prod_i (-i)^(b_i x_i), b_flat
# unravelling with qubit 0 slowest.
_B = np.array(list(itertools.product(range(4), repeat=N)))  # (4^N, N)
_F = (-1j) ** (_B @ X.T)
F_R = _F.real.astype(np.float32)
F_I = _F.imag.astype(np.float32)

TOPK = 48


@jax.jit
def _sweep(rr, ri):
    """Top-K |corr|^2 over the (4^N, NA) candidate grid."""
    fr_r = F_R * rr[None, :] - F_I * ri[None, :]
    fr_i = F_R * ri[None, :] + F_I * rr[None, :]
    cr = fr_r @ SIGNS
    ci = fr_i @ SIGNS
    mag2 = cr * cr + ci * ci  # (4^N, NA)
    return jax.lax.top_k(mag2.ravel(), TOPK)


def sweep(resid):
    v, idx = _sweep(
        resid.real.astype(np.float32), resid.imag.astype(np.float32)
    )
    return np.asarray(v), np.asarray(idx)


def amp(flat_idx):
    b_flat, A_int = np.unravel_index(flat_idx, (4**N, NA))
    b = np.array(np.unravel_index(b_flat, (4,) * N))
    A_mask = (int(A_int) >> np.arange(15)) & 1
    sign = (-1.0) ** (PAIR_COLS @ A_mask % 2)
    phase = (1j) ** (X @ b)
    return sign * phase, int(A_int), tuple(int(x) for x in b)


def omp(seed=0, restarts=48, rank=7):
    rng = np.random.default_rng(seed)
    best = None
    for r in range(restarts):
        chosen, vecs = [], []
        resid = target.copy()
        coef = None
        for step in range(rank):
            vals, idxs = sweep(resid)
            pick = idxs[0] if r == 0 else rng.choice(
                idxs[: max(4, TOPK >> step)]
            )
            v, A_int, b = amp(int(pick))
            chosen.append((A_int, b))
            vecs.append(v)
            Vm = np.stack(vecs, axis=1)
            coef, *_ = np.linalg.lstsq(Vm, target, rcond=None)
            resid = target - Vm @ coef
            rn = np.linalg.norm(resid)
            if rn < 1e-6:
                print(f"EXACT at {len(vecs)} terms (restart {r})", flush=True)
                return chosen, coef
        rn = np.linalg.norm(resid)
        print(f"restart {r}: residual {rn:.6f}", flush=True)
        if best is None or rn < best[0]:
            best = (rn, chosen, coef)
    print(f"best residual {best[0]:.6f}")
    return None, None


if __name__ == "__main__":
    chosen, coef = omp()
    if chosen:
        print("terms:")
        for (A_int, b), c in zip(chosen, coef):
            pairs = [PAIRS[k] for k in range(15) if (A_int >> k) & 1]
            print(f"  A={pairs} b={list(b)} c={c!r}", flush=True)
