"""Probe: does the axon tunnel overlap device execute with d2h fetches?

Times, on the d3 distillation workload (the headline bench):
  1. compute-only: dispatch N batches, fetch only the tiny norm scalar
  2. fetch-only: re-fetch the packed outputs of already-computed batches
  3. end-to-end: the production _sample_batches loop
  4. threaded fetch: dispatch all, drain fetches from a worker thread
Run ON TPU from /root/repo:  python dev/d2h_probe.py
"""

import sys
import threading
import time

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

    # warmup compile
    t0 = time.perf_counter()
    out, dev = runner(key, np.uint32(0))
    jax.device_get(dev)
    print(f"warmup {time.perf_counter()-t0:.1f}s out={out.shape} {out.dtype}")

    # 1. compute-only (fetch 1-float norm scalar per batch)
    t0 = time.perf_counter()
    pend = [runner(key, np.uint32(i)) for i in range(NBATCH)]
    for _, d in pend:
        jax.device_get(d)
    t_compute = time.perf_counter() - t0
    print(f"compute-only: {t_compute:.3f}s "
          f"({NBATCH*BATCH/t_compute/1e6:.2f}M shots/s)")

    # 2. fetch-only (outputs already computed above)
    nbytes = NBATCH * out.size * out.dtype.itemsize
    t0 = time.perf_counter()
    for o, _ in pend:
        jax.device_get(o)
    t_fetch = time.perf_counter() - t0
    print(f"fetch-only: {t_fetch:.3f}s ({nbytes/t_fetch/1e6:.1f}MB/s, "
          f"{nbytes/1e6:.1f}MB total)")

    # 3. end-to-end production loop
    t0 = time.perf_counter()
    pend = [runner(key, np.uint32(i + 8)) for i in range(NBATCH)]
    for o, d in pend:
        packed, _ = jax.device_get((o, d))
        np.unpackbits(np.asarray(packed), axis=1, bitorder="little")
    t_e2e = time.perf_counter() - t0
    print(f"e2e serial: {t_e2e:.3f}s ({NBATCH*BATCH/t_e2e/1e6:.2f}M shots/s) "
          f"[sum={t_compute+t_fetch:.3f} max={max(t_compute,t_fetch):.3f}]")

    # 4. threaded fetch: worker drains device_get while main thread unpacks
    results = [None] * NBATCH

    def drain(pend):
        for i, (o, d) in enumerate(pend):
            results[i] = jax.device_get((o, d))

    t0 = time.perf_counter()
    pend = [runner(key, np.uint32(i + 16)) for i in range(NBATCH)]
    th = threading.Thread(target=drain, args=(pend,))
    th.start()
    done = 0
    while done < NBATCH:
        if results[done] is None:
            time.sleep(0.001)
            continue
        packed, _ = results[done]
        np.unpackbits(np.asarray(packed), axis=1, bitorder="little")
        done += 1
    th.join()
    t_thread = time.perf_counter() - t0
    print(f"threaded: {t_thread:.3f}s ({NBATCH*BATCH/t_thread/1e6:.2f}M shots/s)")


if __name__ == "__main__":
    main()
