"""Per-rung evaluate timing on the checkpointed 2-check cultivation sampler.

Loads /tmp/cult2_sampler.ckpt, then times each ladder rung's evaluate
(exact vs f32 sampling kernel) at a fixed batch, plus the end-to-end
sampling step, to show where the wide-ladder wall time goes.

    python dev/cult2_eval_profile.py [batch_log2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

CKPT = "/tmp/cult2_sampler.ckpt"


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> None:
    b_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 14
    B = 1 << b_log2

    from tsim_tpu.sampler import CompiledDetectorSampler
    from tsim_tpu.compile.pallas_evaluate import evaluate_abs_auto
    from tsim_tpu.compile.pallas_sample import (
        evaluate_abs_sample_f32,
        sample_eligible,
    )

    smp = CompiledDetectorSampler.load(CKPT)
    rng = np.random.default_rng(0)

    total_exact = total_f32 = 0.0
    print(f"batch {B}; per-rung eval best-of-5 (ms)")
    for ci, comp in enumerate(smp._program.components):
        ladder = comp.compiled_scalar_graphs
        for ri, rung in enumerate(ladder):
            P = rung.n_params
            x = rng.integers(0, 2, size=(B + 1, P)).astype(np.uint8)
            xd = jax.device_put(x)
            te = timed(jax.jit(lambda v, r=rung: evaluate_abs_auto(r, v)), xd)
            elig = sample_eligible(rung)
            tf = (
                timed(
                    jax.jit(lambda v, r=rung: evaluate_abs_sample_f32(r, v)),
                    xd,
                )
                if elig
                else te
            )
            total_exact += te
            total_f32 += tf
            t1 = int(np.asarray(rung.node_phases.counts).max(initial=0))
            t4 = int(np.asarray(rung.phase_pairs.counts).max(initial=0))
            print(
                f"  c{ci} r{ri:2d}: G={rung.num_graphs:5d} P={P:3d} "
                f"T1max={t1:3d} T4max={t4:3d} "
                f"exact {te*1e3:7.2f}  f32 {tf*1e3:7.2f}"
                + ("" if elig else "  (ineligible)")
            )
    print(
        f"eval totals per batch: exact {total_exact*1e3:.1f} ms, "
        f"f32 {total_f32*1e3:.1f} ms -> "
        f"{B/total_exact:,.0f} vs {B/total_f32:,.0f} shots/s eval-bound"
    )


if __name__ == "__main__":
    main()
