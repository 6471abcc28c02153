import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu.models.distillation import distillation_d3
from tsim_tpu.sampler import sample_program_with_deviation

def log(m): print(m, file=sys.stderr, flush=True)

circuit = distillation_d3(p=0.05)
sampler = circuit.compile_detector_sampler(seed=0)
dcs = sampler._device_channels
prog = sampler._program
log(f"channels C={dcs.num_channels} O={dcs.cdf.shape[1] if dcs.num_channels else 0} F={dcs.num_f}")

B = 16384
NB = 16

def noise_only(kpairs):
    def one(kp):
        f = dcs.sample(kp[0], B)
        return jnp.sum(f.astype(jnp.int32)), jnp.zeros((1,), jnp.float32)
    return jax.lax.map(one, kpairs)

def full(kpairs):
    def one(kp):
        f = dcs.sample(kp[0], B)
        out, dev = sample_program_with_deviation(prog, f, kp[1])
        return jnp.sum(out.astype(jnp.int32)), dev
    return jax.lax.map(one, kpairs)

def eval_only(kpairs):
    # noise + all ladder evaluations, but no sampling logic
    from tsim_tpu.compile.evaluate import evaluate_abs
    from tsim_tpu.ops.gf2 import static_take_columns
    def one(kp):
        f = dcs.sample(kp[0], B)
        tot = jnp.zeros((B,), jnp.float32)
        for comp in prog.components:
            fs = static_take_columns(f, comp.f_selection).astype(jnp.uint8)
            for csg in comp.compiled_scalar_graphs:
                pars = jnp.hstack([fs, jnp.ones((B, csg.n_params - fs.shape[1]), jnp.uint8)])
                tot = tot + evaluate_abs(csg, pars)
        return tot, jnp.zeros((1,), jnp.float32)
    return jax.lax.map(one, kpairs)

keys = jax.random.split(jax.random.key(0), NB * 2).reshape(NB, 2)
for name, fn in (("noise_only", noise_only), ("eval_only", eval_only), ("full", full)):
    f = jax.jit(fn)
    t0 = time.perf_counter(); out = f(keys); np.asarray(jax.device_get(out[0]))
    log(f"{name} warmup {time.perf_counter()-t0:.0f}s")
    t0 = time.perf_counter(); out = f(keys); np.asarray(jax.device_get(out[0]))
    dt = time.perf_counter() - t0
    log(f"{name}: total {dt*1e3:.0f}ms, {dt/NB*1e3:.1f} ms/batch -> {B*NB/dt/1e3:.0f}k shots/s (incl ~30ms rtt)")
