"""Compile the heavy cultivation circuit, checkpoint it, try sampling.

Reproduces the large-program remote-compile failure (ROADMAP item 3).
Run:  PYTHONPATH=/root/repo:/root/.axon_site python dev/cult_compile.py
"""

import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu.models.cultivation import cultivation_d3

CKPT = "/tmp/cult_d3.ckpt"


def log(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def main():
    import os

    if os.path.exists(CKPT):
        log(f"loading checkpoint {CKPT}")
        from tsim_tpu.sampler import CompiledDetectorSampler

        sampler = CompiledDetectorSampler.load(CKPT)
    else:
        t0 = time.perf_counter()
        c = cultivation_d3(p=0.001)
        sampler = c.compile_detector_sampler(seed=0)
        log(f"compiled in {time.perf_counter() - t0:.0f}s; stats {sampler.compile_stats}")
        sampler.save(CKPT)
        log(f"saved {CKPT}")
    prog = sampler._program
    tot_graphs = sum(
        csg.num_graphs
        for comp in prog.components
        for csg in comp.compiled_scalar_graphs
    )
    log(
        f"components={len(prog.components)} total_graphs={tot_graphs} "
        f"outputs={prog.num_outputs}"
    )
    t0 = time.perf_counter()
    try:
        det = sampler.sample(4096, batch_size=4096)
        log(f"sampled 4096 in {time.perf_counter() - t0:.0f}s mean={det.mean():.4f}")
    except Exception as e:
        log(f"SAMPLE FAILED after {time.perf_counter() - t0:.0f}s: {type(e).__name__}: {str(e)[:2000]}")
        sys.exit(1)


if __name__ == "__main__":
    main()
