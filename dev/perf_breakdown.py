"""Perf breakdown of the headline d3-distillation detector bench.

Splits the benchmark's wall time into (1) pure device compute — noise
sampling + the evaluate ladder + bitplane packing, dispatched and blocked
on-device — and (2) pure d2h over the tunnel for the packed outputs, then
reports the implied overlapped pipeline bound. Run on the live TPU:

    python dev/perf_breakdown.py [num_batches] [log2_batch]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
# NOTE: do NOT set PYTHONPATH instead — it breaks registration of the axon
# TPU plugin ("Backend 'axon' is not in the list of known backends").

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu import sampler as S
from tsim_tpu.models.distillation import distillation_d3


def main() -> None:
    num_batches = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    batch = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 20)
    shots = num_batches * batch

    t0 = time.perf_counter()
    smp = distillation_d3(p=0.05).compile_detector_sampler(seed=0)
    print(f"host compile {time.perf_counter() - t0:.0f}s", flush=True)

    runner = S._device_run_fn(
        smp._program, smp._device_channels, num_batches, batch
    )
    base_key = jax.random.key(1)

    t0 = time.perf_counter()
    out = runner(base_key, np.uint32(0))
    jax.block_until_ready(out)
    print(f"device warmup (compile) {time.perf_counter() - t0:.0f}s", flush=True)

    # Device-only: dispatch every batch, block on device, never fetch.
    t0 = time.perf_counter()
    outs = [runner(base_key, np.uint32(i)) for i in range(num_batches)]
    jax.block_until_ready(outs)
    dt_dev = time.perf_counter() - t0

    packed = outs[0][0]
    nbytes = packed.size * packed.dtype.itemsize
    print(
        f"device-only: {shots / dt_dev:,.0f} shots/s"
        f"  ({dt_dev:.2f}s, packed {nbytes / 2**20:.1f} MiB/batch)",
        flush=True,
    )

    # d2h-only on the already-materialized device arrays.
    t0 = time.perf_counter()
    for o in outs:
        jax.device_get(o)
    dt_d2h = time.perf_counter() - t0
    bw = num_batches * nbytes / dt_d2h
    print(
        f"d2h-only:    {shots / dt_d2h:,.0f} shots/s"
        f"  ({dt_d2h:.2f}s, {bw / 2**20:.0f} MiB/s tunnel)",
        flush=True,
    )

    bound = shots / max(dt_dev, dt_d2h)
    which = "device compute" if dt_dev > dt_d2h else "tunnel d2h"
    print(f"overlapped pipeline bound: {bound:,.0f} shots/s ({which}-limited)")

    # Measured end-to-end for comparison.
    t0 = time.perf_counter()
    det = smp.sample(shots, batch_size=batch)
    dt = time.perf_counter() - t0
    assert det.shape[0] == shots
    print(f"end-to-end:  {shots / dt:,.0f} shots/s  ({dt:.2f}s)")


if __name__ == "__main__":
    main()
