"""Oracle-verify split_bss6 on random graphs with >= 6 magic phases."""
import random

import numpy as np

from tsim_tpu.zx.decompose import split_bss6
from tsim_tpu.zx.graph import HADAMARD, SIMPLE, Z, ZXGraph
from tsim_tpu.zx.tensor import graph_to_tensor, graphs_sum_to_tensor
from fractions import Fraction


def random_graph(seed, n_magic=6, n_clifford=4, n_bound=3):
    rng = random.Random(seed)
    g = ZXGraph()
    verts = []
    for k in range(n_magic):
        ph = Fraction(rng.choice([1, 3, 5, 7]), 4)
        verts.append(g.add_vertex(Z, qubit=k, row=0, phase=ph))
    for k in range(n_clifford):
        ph = Fraction(rng.choice([0, 1, 2, 3]), 2)
        verts.append(g.add_vertex(Z, qubit=k, row=1, phase=ph))
    from tsim_tpu.zx.graph import BOUNDARY

    bs = []
    for k in range(n_bound):
        b = g.add_vertex(BOUNDARY, qubit=k, row=2)
        v = rng.choice(verts)
        g.add_edge((b, v), SIMPLE)
        bs.append(b)
    g.set_outputs(bs)
    # random H edges among interior spiders
    for _ in range(12):
        u, v = rng.sample(verts, 2)
        if not g.connected(u, v):
            g.add_edge((u, v), HADAMARD)
    # params on some magic spiders
    for v in verts[:3]:
        if rng.random() < 0.5:
            g.set_params(v, (f"e{rng.randrange(2)}",))
    return g


def main():
    bad = 0
    for seed in range(40):
        g = random_graph(seed)
        t0 = graph_to_tensor(g, vals={"e0": seed % 2, "e1": (seed // 2) % 2})
        gs = split_bss6(g)
        assert len(gs.graphs) == 7
        t1 = graphs_sum_to_tensor(
            gs.graphs, vals={"e0": seed % 2, "e1": (seed // 2) % 2}
        )
        err = np.abs(t0 - t1).max()
        scale = max(np.abs(t0).max(), 1.0)
        ok = err / scale < 1e-9
        if not ok:
            bad += 1
            print(f"seed {seed}: FAIL rel_err={err/scale:.3e} scale={scale:.3e}")
        else:
            print(f"seed {seed}: ok rel_err={err/scale:.2e}")
    print("BAD:", bad)


if __name__ == "__main__":
    main()
