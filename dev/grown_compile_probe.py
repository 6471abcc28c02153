"""Profile the grown-cultivation compile: per-rung / per-variant timing.

Wraps find_stab and plan_projector_cover with timers to find where the
checks=2 compile time goes. Usage:
    python dev/grown_compile_probe.py [checks]
"""
import os, sys, time

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import tsim_tpu.compile.pipeline as pipeline
from tsim_tpu.zx import decompose as dz

_orig_find_stab = pipeline.find_stab
_orig_plan = dz.plan_projector_cover


def timed_find_stab(g, **kw):
    t0 = time.time()
    tc = dz.tcount(g)
    try:
        out = _orig_find_stab(g, **kw)
        n = len(out)
    except Exception as e:
        n = f"ABORT:{type(e).__name__}"
        raise
    finally:
        print(
            f"  find_stab tcount={tc} -> {n} ({time.time()-t0:.1f}s)",
            flush=True,
        )
    return out


def timed_plan(g, gadgets, restarts=512):
    t0 = time.time()
    out = _orig_plan(g, gadgets, restarts=restarts)
    dt = time.time() - t0
    if dt > 0.5:
        print(
            f"    plan gadgets={len(gadgets)} restarts={restarts} "
            f"({dt:.1f}s)",
            flush=True,
        )
    return out


pipeline.find_stab = timed_find_stab
dz.plan_projector_cover = timed_plan
# decompose module may call it internally by name
for mod in (dz,):
    mod.plan_projector_cover = timed_plan

if __name__ == "__main__":
    checks = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    from tsim_tpu.models.cultivation import cultivation_d3_grown

    t0 = time.time()
    c = cultivation_d3_grown(p=0.001, checks=checks)
    print(f"circuit built ({time.time()-t0:.1f}s)", flush=True)
    s = c.compile_detector_sampler(seed=3)
    print(f"TOTAL compile {time.time()-t0:.1f}s", flush=True)
    counts = [
        circ.num_graphs
        for comp in s._program.components
        for circ in comp.compiled_scalar_graphs
    ]
    print("per-rung graphs:", counts, "max", max(counts), "total", sum(counts))
