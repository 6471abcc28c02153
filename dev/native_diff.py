"""Differential debug: native vs python full_reduce on fuzz graphs."""
import itertools
import sys

sys.path.insert(0, "/root/repo")
import numpy as np

from dev.fuzz_simplify import PARAMS, random_graph
from tsim_tpu.zx import simplify
from tsim_tpu.zx.native_simplify import native_full_reduce
from tsim_tpu.zx.tensor import graph_to_tensor


def describe(g, tag):
    s = g.scalar
    print(f"--- {tag}: {g!r}")
    for v in sorted(g._ty):
        print(f"  v{v} ty={g._ty[v]} ph={g._phase[v]} par={sorted(g._params[v])} "
              f"adj={dict(sorted(g._adj[v].items()))}")
    print(f"  scalar p2={s.power2} ph={s.phase} ff=({s.floatfactor.a},{s.floatfactor.b},"
          f"{s.floatfactor.c},{s.floatfactor.d}) apx={s.approximate_floatfactor} zero={s.is_zero}")
    print(f"  nodes={list(zip(s.phasenodes, [sorted(x) for x in s.phasenodevars]))}")
    print(f"  halfpi={{{ {j: [sorted(x) for x in lst] for j, lst in s.phasevars_halfpi.items()} }}}")
    print(f"  pipairs={[(sorted(a), sorted(b)) for a, b in s.phasevars_pi_pair]}")
    print(f"  pairs={[(pp.alpha, pp.beta, sorted(pp.paramsA), sorted(pp.paramsB)) for pp in s.phasepairs]}")


def tensors(g):
    assignments = [dict(zip(PARAMS, bits)) for bits in itertools.product([0, 1], repeat=3)]
    out = []
    for a in assignments:
        if g.scalar.is_zero:
            out.append(None)
        else:
            out.append(np.asarray(graph_to_tensor(g, vals=a)))
    return assignments, out


def main():
    rng = np.random.default_rng(42)
    for trial in range(120):
        clifford = trial % 3 == 0
        g = random_graph(
            rng,
            n_interior=int(rng.integers(3, 8)),
            n_boundary=int(rng.integers(0, 3)),
            clifford_only=clifford,
        )
        assignments, t_ref = tensors(g)

        gn = g.copy()
        ok_native = native_full_reduce(gn, simplify._SHAKE_ENABLED)
        gp = g.copy()
        simplify.set_shake(simplify._SHAKE_ENABLED)
        # force python path
        import tsim_tpu.zx.native_simplify as ns
        saved = ns.native_full_reduce
        ns.native_full_reduce = lambda *a: False
        simplify.full_reduce(gp)
        ns.native_full_reduce = saved

        bad = False
        for a, tr in zip(assignments, t_ref):
            tn = (np.zeros_like(tr) if gn.scalar.is_zero
                  else np.asarray(graph_to_tensor(gn, vals=a)))
            if not np.allclose(tr, tn, atol=1e-7):
                bad = True
                print(f"trial{trial} native mismatch at {a}: ref={tr.ravel()[:4]} native={tn.ravel()[:4]}")
                break
        if bad:
            describe(g, "input")
            describe(gn, "native")
            describe(gp, "python")
            return


if __name__ == "__main__":
    main()
