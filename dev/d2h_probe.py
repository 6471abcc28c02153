import sys, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import time
import numpy as np
import jax, jax.numpy as jnp

def log(m): print(m, file=sys.stderr, flush=True)

import functools
@functools.partial(jax.jit, static_argnums=1)
def gen(key, n):
    return (jax.random.uniform(key, (n,)) < 0.5).astype(jnp.uint8)

key = jax.random.key(0)
for n in (1024, 65536, 1 << 20, 1 << 23):
    x = gen(key, n)
    x.block_until_ready() if hasattr(x, "block_until_ready") else None
    t0 = time.perf_counter()
    h = np.asarray(jax.device_get(x))
    dt = time.perf_counter() - t0
    log(f"d2h {n/1024:.0f}KB: {dt*1e3:.0f}ms -> {n/dt/1e6:.2f} MB/s")
# h2d
for n in (1 << 20, 1 << 23):
    h = np.ones(n, np.uint8)
    t0 = time.perf_counter()
    d = jnp.asarray(h)
    d.block_until_ready()
    dt = time.perf_counter() - t0
    log(f"h2d {n/1024:.0f}KB: {dt*1e3:.0f}ms -> {n/dt/1e6:.2f} MB/s")
