"""Fused-kernel-vs-XLA sweep on real TPU hardware.

Runs the Mosaic-compiled fused evaluate against the XLA exact path for
every compiled circuit of several workloads (incl. the headline d3
distillation) and reports max deviation. Run on a TPU host:

    python dev/tpu_kernel_check.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax

    assert jax.default_backend() == "tpu", jax.default_backend()
    import tsim_tpu
    from tsim_tpu.compile.evaluate import evaluate_abs
    from tsim_tpu.compile.pallas_evaluate import (
        evaluate_abs_fused,
        evaluate_abs_fused_small,
    )
    from tsim_tpu.models.distillation import distillation_d3

    rng = np.random.default_rng(0)
    worst = 0.0
    circuits = {
        "bell-T": "H 0\nT 0\nCNOT 0 1\nDEPOLARIZE1(0.1) 0 1\nM 0 1\n"
        "DETECTOR rec[-1] rec[-2]",
        "pair": "H 0\nH 1\nCZ 0 1\nT 0\nX_ERROR(0.25) 1\nH 0 1\nM 0 1",
    }
    samplers = {k: tsim_tpu.Circuit(t).compile_sampler(seed=0) for k, t in circuits.items()}
    samplers["d3-distillation"] = distillation_d3(p=0.05).compile_detector_sampler(seed=0)
    for name, s in samplers.items():
        for comp in s._program.components:
            for csg in comp.compiled_scalar_graphs:
                x = rng.integers(0, 2, size=(256, csg.n_params)).astype(np.uint8)
                t0 = time.time()
                want = np.asarray(evaluate_abs(csg, x))
                got = np.asarray(evaluate_abs_fused(csg, x))
                got_small = np.asarray(evaluate_abs_fused_small(csg, x))
                scale = max(np.abs(want).max(), 1e-30)
                dev = float(np.abs(want - got).max() / scale)
                dev_s = float(np.abs(want - got_small).max() / scale)
                worst = max(worst, dev, dev_s)
                print(
                    f"{name}: G={csg.num_graphs} P={csg.n_params} "
                    f"rel dev wide {dev:.2e} small {dev_s:.2e} "
                    f"({time.time()-t0:.0f}s)",
                    flush=True,
                )
    print(f"WORST: {worst:.2e}")
    assert worst < 2e-5, worst


if __name__ == "__main__":
    main()
