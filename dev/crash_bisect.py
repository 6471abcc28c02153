import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu.models.distillation import distillation_d3
from tsim_tpu.compile.pallas_evaluate import evaluate_abs_fused
from tsim_tpu.sampler import _program_runner, _device_run_fn

def log(m): print(m, file=sys.stderr, flush=True)

circuit = distillation_d3(p=0.05)
sampler = circuit.compile_detector_sampler(seed=0)
prog = sampler._program
csgs = [c for comp in prog.components for c in comp.compiled_scalar_graphs]
csgs.sort(key=lambda c: -c.num_graphs)
csg = csgs[0]
key = jax.random.key(1)

def attempt(name, fn):
    t0 = time.perf_counter()
    try:
        out = fn()
        np.asarray(jax.device_get(jax.tree_util.tree_leaves(out)[0].ravel()[:4]))
        log(f"{name}: OK ({time.perf_counter()-t0:.0f}s)")
        return True
    except Exception as e:
        log(f"{name}: FAIL {type(e).__name__}: {str(e)[:140]}")
        return False

# 1: single kernel, B = 2^19
v_big = jnp.zeros((1 << 19, csg.n_params), jnp.uint8)
attempt("single-kernel-B19", jax.jit(lambda v: evaluate_abs_fused(csg, v)).lower(v_big).compile if False else (lambda: jax.jit(lambda v: evaluate_abs_fused(csg, v))(v_big)))

# 2: full program runner (6 kernels, vstack B+1), B = 16384
v16 = jnp.zeros((16384, 21), jnp.uint8)
attempt("program-runner-B16384", lambda: _program_runner(prog)(v16, key))

# 3: device runner (noise + program), B = 16384
attempt("device-runner-B16384", lambda: _device_run_fn(prog, sampler._device_channels, 1, 16384)(jax.random.split(key, 2)))
