import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time, numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu.models.distillation import distillation_d3
from tsim_tpu.compile.evaluate import evaluate_abs
from tsim_tpu.compile.pallas_evaluate import evaluate_abs_fused

def log(m): print(m, file=sys.stderr, flush=True)

t0 = time.perf_counter()
circuit = distillation_d3(p=0.05)
sampler = circuit.compile_detector_sampler(seed=0)
log(f"host compile {time.perf_counter()-t0:.0f}s")
csgs = [c for comp in sampler._program.components for c in comp.compiled_scalar_graphs]
csgs.sort(key=lambda c: -c.num_graphs)
csg = csgs[0]
log(f"largest csg: G={csg.num_graphs} P={csg.n_params}")

B = 16384
vals = np.random.default_rng(0).integers(0, 2, size=(B, csg.n_params)).astype(np.uint8)
vals_d = jnp.asarray(vals)

f_xla = jax.jit(lambda v: jnp.sum(evaluate_abs(csg, v)))
f_pal = jax.jit(lambda v: jnp.sum(evaluate_abs_fused(csg, v)))
N = 8
f_xla_n = jax.jit(lambda v: sum(jnp.sum(evaluate_abs(csg, v + i)) for i in range(N)))
f_pal_n = jax.jit(lambda v: sum(jnp.sum(evaluate_abs_fused(csg, v + i)) for i in range(N)))

for name, f1, fn in (("xla-tree", f_xla, f_xla_n), ("pallas", f_pal, f_pal_n)):
    t0 = time.perf_counter()
    s1 = float(np.asarray(jax.device_get(f1(vals_d))))
    log(f"{name} warmup {time.perf_counter()-t0:.0f}s (sum={s1:.3f})")
    t0 = time.perf_counter()
    np.asarray(jax.device_get(f1(vals_d)))
    t1 = time.perf_counter() - t0
    np.asarray(jax.device_get(fn(vals_d)))  # warm the N-fold jit
    t0 = time.perf_counter()
    np.asarray(jax.device_get(fn(vals_d)))
    tn = time.perf_counter() - t0
    log(f"{name}: 1-eval {t1*1e3:.0f}ms, {N}-eval {tn*1e3:.0f}ms -> {(tn-t1)/(N-1)*1e3:.1f} ms/eval")
