"""Timing harness for the compute-bound 2-check cultivation workload.

Compiles once, checkpoints the sampler to /tmp, and on subsequent runs
loads it (skipping the ~7 min host ZX compile) before timing detector
sampling on the live TPU. Use to measure kernel-level changes (parity
matmul dtype, tile shapes) on the widest-ladder benchmark.

    python dev/cult2_kernel_probe.py [shots_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

CKPT = "/tmp/cult2_sampler.ckpt"


def main() -> None:
    shots = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 18)

    from tsim_tpu.sampler import CompiledDetectorSampler

    if os.path.exists(CKPT):
        t0 = time.perf_counter()
        smp = CompiledDetectorSampler.load(CKPT)
        print(f"loaded checkpoint in {time.perf_counter() - t0:.0f}s", flush=True)
    else:
        from tsim_tpu.models.cultivation import cultivation_d3

        t0 = time.perf_counter()
        smp = cultivation_d3(checks=2).compile_detector_sampler(seed=0)
        print(f"host compile {time.perf_counter() - t0:.0f}s", flush=True)
        smp.save(CKPT)

    t0 = time.perf_counter()
    smp.sample(1024, batch_size=1024)
    print(f"device warmup {time.perf_counter() - t0:.0f}s", flush=True)

    best = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        det = smp.sample(shots, batch_size=shots)
        dt = time.perf_counter() - t0
        assert det.shape[0] == shots
        best = max(best, shots / dt)
        print(f"run: {shots / dt:,.0f} shots/s ({dt:.2f}s)", flush=True)
    print(f"best: {best:,.0f} shots/s")


if __name__ == "__main__":
    main()
