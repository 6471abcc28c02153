"""Probe: does parallelizing tunnel d2h fetches beat the serial drain thread?

The perf breakdown (dev/perf_breakdown.py) shows the d3 bench is d2h-bound
through the remote-TPU tunnel, and per-transfer latency (not bandwidth)
dominates at 2.5 MiB/batch. If the tunnel allows concurrent transfers,
fetching K batches from K threads pipelines that latency.
"""

import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu import sampler as S
from tsim_tpu.models.distillation import distillation_d3


def main() -> None:
    num_batches = 16
    batch = 1 << 20
    shots = num_batches * batch

    smp = distillation_d3(p=0.05).compile_detector_sampler(seed=0)
    runner = S._device_run_fn(
        smp._program, smp._device_channels, num_batches, batch
    )
    base_key = jax.random.key(1)
    jax.block_until_ready(runner(base_key, np.uint32(0)))

    for workers in (1, 2, 4, 8):
        outs = [runner(base_key, np.uint32(i)) for i in range(num_batches)]
        jax.block_until_ready(outs)
        t0 = time.perf_counter()
        if workers == 1:
            fetched = [jax.device_get(o) for o in outs]
        else:
            with ThreadPoolExecutor(max_workers=workers) as ex:
                fetched = list(ex.map(jax.device_get, outs))
        dt = time.perf_counter() - t0
        assert len(fetched) == num_batches
        print(
            f"workers={workers}: {shots / dt:,.0f} shots/s ({dt:.2f}s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
