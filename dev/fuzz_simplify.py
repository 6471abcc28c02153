"""Fuzz full_reduce: tensor equivalence on random parametric graphs."""
import itertools
import sys
from fractions import Fraction

sys.path.insert(0, "/root/repo")
import numpy as np

from tsim_tpu.zx.graph import BOUNDARY, HADAMARD, SIMPLE, X, Z, ZXGraph
from tsim_tpu.zx.simplify import full_reduce
from tsim_tpu.zx.tensor import graph_to_tensor

PHASES = [Fraction(k, 4) for k in range(8)] + [Fraction(3, 10), Fraction(7, 5)]
PARAMS = ["e0", "e1", "e2"]


def random_graph(rng, n_interior=6, n_boundary=2, p_edge=0.35, p_param=0.3,
                 clifford_only=False, allow_x=True):
    g = ZXGraph()
    interior = []
    for _ in range(n_interior):
        ty = Z if (not allow_x or rng.random() < 0.7) else X
        if clifford_only:
            ph = Fraction(rng.integers(0, 4), 2)
        else:
            ph = PHASES[rng.integers(0, len(PHASES))]
        v = g.add_vertex(ty, phase=ph)
        if rng.random() < p_param:
            ps = {PARAMS[i] for i in rng.choice(3, size=rng.integers(1, 3), replace=False)}
            g.set_params(v, ps)
        interior.append(v)
    for a, b in itertools.combinations(interior, 2):
        if rng.random() < p_edge:
            g.add_edge((a, b), HADAMARD if rng.random() < 0.8 else SIMPLE)
    outs = []
    for _ in range(n_boundary):
        b = g.add_vertex(BOUNDARY)
        t = interior[rng.integers(0, len(interior))]
        while g.connected(b, t):
            t = interior[rng.integers(0, len(interior))]
        g.add_edge((b, t), HADAMARD if rng.random() < 0.5 else SIMPLE)
        outs.append(b)
    g.set_outputs(outs)
    return g


def check(g, tag, rng):
    assignments = [dict(zip(PARAMS, bits)) for bits in itertools.product([0, 1], repeat=3)]
    t_before = [graph_to_tensor(g, vals=a) for a in assignments]
    g2 = g.copy()
    try:
        full_reduce(g2)
    except Exception as e:
        print(f"[{tag}] EXCEPTION: {type(e).__name__}: {e}")
        return False
    ok = True
    for a, tb in zip(assignments, t_before):
        if g2.scalar.is_zero:
            ta = np.zeros_like(np.asarray(tb))
        else:
            ta = graph_to_tensor(g2, vals=a)
        if not np.allclose(np.asarray(tb), np.asarray(ta), atol=1e-7):
            print(f"[{tag}] MISMATCH at {a}:\n  before={np.asarray(tb).ravel()[:4]}\n  after ={np.asarray(ta).ravel()[:4]}")
            ok = False
            break
    return ok


def main():
    rng = np.random.default_rng(42)
    fails = 0
    for trial in range(120):
        clifford = trial % 3 == 0
        g = random_graph(
            rng,
            n_interior=int(rng.integers(3, 8)),
            n_boundary=int(rng.integers(0, 3)),
            clifford_only=clifford,
        )
        if not check(g, f"trial{trial}{'c' if clifford else ''}", rng):
            fails += 1
            if fails > 5:
                break
    print(f"done, fails={fails}")


if __name__ == "__main__":
    main()
