import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu.models.distillation import distillation_d3
from tsim_tpu.compile.pallas_evaluate import evaluate_abs_fused

def log(m): print(m, file=sys.stderr, flush=True)

circuit = distillation_d3(p=0.05)
sampler = circuit.compile_detector_sampler(seed=0)
prog = sampler._program
csgs = [c for comp in prog.components for c in comp.compiled_scalar_graphs]
csgs.sort(key=lambda c: -c.num_graphs)

def attempt(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        np.asarray(jax.device_get(out.ravel()[:4]))
        log(f"{name}: OK ({time.perf_counter()-t0:.0f}s)")
        return True
    except Exception as e:
        log(f"{name}: FAIL {type(e).__name__}: {str(e)[:100]}")
        return False

B = 16384
vals = {c.n_params: jnp.zeros((B, c.n_params), jnp.uint8) for c in csgs}

# G=1 norm circuit alone
norm = csgs[-1]
log(f"norm circuit G={norm.num_graphs}")
attempt("G1-alone", lambda: jax.jit(lambda v: evaluate_abs_fused(norm, v))(vals[norm.n_params]))
# two large kernels in one jit
a, b = csgs[0], csgs[1]
attempt("two-large", lambda: jax.jit(
    lambda v1, v2: evaluate_abs_fused(a, v1) + jnp.pad(evaluate_abs_fused(b, v2), (0, 0))
)(vals[a.n_params], vals[b.n_params]))
# odd batch rows (B+1 vstack as in the ladder)
attempt("odd-rows", lambda: jax.jit(
    lambda v: evaluate_abs_fused(a, jnp.vstack([v, v[:1]]))
)(vals[a.n_params]))
