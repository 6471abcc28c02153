import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu.models.distillation import distillation_d3
import tsim_tpu.compile.pallas_evaluate as pe

def log(m): print(m, file=sys.stderr, flush=True)

circuit = distillation_d3(p=0.05)
sampler = circuit.compile_detector_sampler(seed=0)
csgs = [c for comp in sampler._program.components for c in comp.compiled_scalar_graphs]
csgs.sort(key=lambda c: -c.num_graphs)
csg = csgs[0]

B = 16384
vals = jnp.asarray(
    np.random.default_rng(0).integers(0, 2, size=(B, csg.n_params)).astype(np.uint8)
)
N = 24
for bt, gt in ((128, 128), (128, 256), (64, 1024), (128, 1024), (128, 256), (128, 128)):
    pe._BT, pe._GT = bt, gt
    f1 = jax.jit(lambda v: jnp.sum(pe.evaluate_abs_fused(csg, v)))
    fn = jax.jit(lambda v: sum(jnp.sum(pe.evaluate_abs_fused(csg, v + i)) for i in range(N)))
    try:
        np.asarray(jax.device_get(f1(vals)))
        t0 = time.perf_counter(); np.asarray(jax.device_get(f1(vals))); t1 = time.perf_counter() - t0
        np.asarray(jax.device_get(fn(vals)))
        t0 = time.perf_counter(); np.asarray(jax.device_get(fn(vals))); tn = time.perf_counter() - t0
        log(f"BT={bt} GT={gt}: {(tn - t1) / (N - 1) * 1e3:.1f} ms/eval")
    except Exception as e:
        log(f"BT={bt} GT={gt}: FAIL {type(e).__name__} {str(e)[:80]}")
