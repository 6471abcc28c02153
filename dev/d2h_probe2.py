"""Probe 2: does the axon tunnel parallelize concurrent device_get calls?

Also: threaded drain with a 2-worker pool, and dispatch-interleaved order.
Run ON TPU from /root/repo:  python dev/d2h_probe2.py
"""

import sys
import threading
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, "/root/repo")

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu.models.distillation import distillation_d3
from tsim_tpu.sampler import _device_run_fn

BATCH = 1 << 21
NBATCH = 4


def main():
    c = distillation_d3(p=0.05)
    s = c.compile_detector_sampler(seed=0)
    runner = _device_run_fn(
        s._program, s._device_channels, NBATCH, BATCH, mesh=s._mesh
    )
    key = jax.random.key(123)
    out, dev = runner(key, np.uint32(0))
    jax.device_get(dev)
    print("warm", flush=True)

    # A. concurrent fetch of precomputed arrays: 1 vs 2 vs 4 threads
    pend = [runner(key, np.uint32(i)) for i in range(NBATCH)]
    for _, d in pend:
        jax.device_get(d)
    nbytes = NBATCH * out.size * out.dtype.itemsize
    for nthreads in (1, 2, 4):
        t0 = time.perf_counter()
        with ThreadPoolExecutor(nthreads) as ex:
            list(ex.map(lambda p: jax.device_get(p[0]), pend))
        dt = time.perf_counter() - t0
        print(f"fetch x{nthreads}: {dt:.3f}s ({nbytes/dt/1e6:.1f}MB/s)",
              flush=True)

    # B. full pipeline, 2-worker fetch pool
    for nthreads in (2, 4):
        results = [None] * NBATCH
        t0 = time.perf_counter()
        pend = [runner(key, np.uint32(i + 8 * nthreads)) for i in range(NBATCH)]

        def fetch(i):
            results[i] = jax.device_get(pend[i])

        with ThreadPoolExecutor(nthreads) as ex:
            futs = [ex.submit(fetch, i) for i in range(NBATCH)]
            for i, f in enumerate(futs):
                f.result()
                packed, _ = results[i]
                np.unpackbits(np.asarray(packed), axis=1, bitorder="little")
        dt = time.perf_counter() - t0
        print(f"pipeline pool{nthreads}: {dt:.3f}s "
              f"({NBATCH*BATCH/dt/1e6:.2f}M shots/s)", flush=True)

    # C. more smaller batches: 8 x 2^20 with 2-thread pool
    nb, bs = 8, 1 << 20
    runner2 = _device_run_fn(s._program, s._device_channels, nb, bs, mesh=s._mesh)
    o2, d2 = runner2(key, np.uint32(0))
    jax.device_get(d2)
    results = [None] * nb
    t0 = time.perf_counter()
    pend = [runner2(key, np.uint32(i + 100)) for i in range(nb)]

    def fetch2(i):
        results[i] = jax.device_get(pend[i])

    with ThreadPoolExecutor(2) as ex:
        futs = [ex.submit(fetch2, i) for i in range(nb)]
        for i, f in enumerate(futs):
            f.result()
            packed, _ = results[i]
            np.unpackbits(np.asarray(packed), axis=1, bitorder="little")
    dt = time.perf_counter() - t0
    print(f"pipeline 8x2^20 pool2: {dt:.3f}s ({nb*bs/dt/1e6:.2f}M shots/s)",
          flush=True)


if __name__ == "__main__":
    main()
