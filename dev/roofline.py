"""MFU / roofline measurement for the wide-ladder sampling kernel.

Times the f32 sampling kernel (`compile/pallas_sample.py`) per rung of the
2-check cultivation ladder on the real TPU and compares achieved MXU
throughput against the v5e peak. The kernel's MXU work is one (Bt, P) x
(P, Gt) bf16 parity dot per term slot:

    dots/shot = T1 + T2 + 2*T3 + 2*T4      (padded slot counts per bucket)
    FLOPs/dot = 2 * P * Gp                  (padded graph axis)

so FLOPs/shot = sum over buckets of dots * 2 * P * Gp. "Executed" counts
padded slots/graphs (what the MXU actually runs); "useful" counts live
term slots and live graphs (work the math needs). MFU = useful FLOP/s over
the v5e bf16 peak; the executed/useful ratio is the padding overhead.

    python dev/roofline.py [batch_log2] [checks]

Writes nothing; paste the summary into docs/benchmarks.md.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# Single-chip peaks (TPU v5e datasheet): 197 TFLOP/s bf16 MXU,
# 819 GB/s HBM.
V5E_BF16_PEAK = 197e12
V5E_HBM_GBPS = 819e9


def _bucket_flops(circuit, P):
    """(executed, useful) parity-dot FLOPs per shot for one rung."""
    from tsim_tpu.compile.pallas_sample import _prepared_sample_buckets

    executed = sum(
        (d[0] + d[1] + 2 * d[2] + 2 * d[3]) * 2.0 * P * d[5]
        for _, d in _prepared_sample_buckets(circuit, P)[0]
    )
    # Live work: per-(t, g) live term slots. Node/pair families carry
    # explicit counts; halfpi/pi-product padding is all-zero rows.
    c = circuit
    hp = np.asarray(c.halfpi_phases.coeffs)
    psi_live = np.asarray(c.pi_products.psi_params).any(axis=2) | (
        np.asarray(c.pi_products.psi_const) != 0
    )
    phi_live = np.asarray(c.pi_products.phi_params).any(axis=2) | (
        np.asarray(c.pi_products.phi_const) != 0
    )
    live_dots = (
        float(np.asarray(c.node_phases.counts).sum())
        + float(np.count_nonzero(hp))
        + float(np.count_nonzero(psi_live | phi_live)) * 2.0
        + 2.0 * float(np.asarray(c.phase_pairs.counts).sum())
    )
    return executed, live_dots * 2.0 * P


def timed(fn, xs, reps=3):
    """Best per-call seconds for ``fn`` over the R distinct inputs ``xs``.

    All R calls run inside ONE jit whose outputs are reduced to a scalar,
    and the scalar is fetched — on the remote-tunnel backend, per-dispatch
    latency is ~25 ms and ``block_until_ready`` on a device array can
    return before the remote computation drains, so naive per-call timing
    reads pure tunnel noise (measured 0.02 ms/"rung" at one batch size and
    25 ms at another). Fetching the scalar forces the whole chain; the
    ~25 ms dispatch bias is amortized over R calls.
    """
    import jax.numpy as jnp

    @jax.jit
    def many(xs):
        tot = jnp.float32(0)
        for x in xs:
            tot = tot + jnp.sum(fn(x))
        return tot

    float(many(xs))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(many(xs))
        best = min(best, time.perf_counter() - t0)
    return best / len(xs)


def main() -> None:
    """python dev/roofline.py [batch_log2] [workload]

    workload: an int (cultivation_d3 checks count, default 2) or
    ``d3dist`` (the 35-qubit d=3 distillation benchmark)."""
    b_log2 = int(sys.argv[1]) if len(sys.argv) > 1 else 15
    wl = sys.argv[2] if len(sys.argv) > 2 else "2"
    B = 1 << b_log2

    from tsim_tpu.models.cultivation import cultivation_d3
    from tsim_tpu.models.distillation import distillation_d3
    from tsim_tpu.sampler import CompiledDetectorSampler
    from tsim_tpu.compile.pallas_sample import (
        evaluate_abs_sample_f32,
        sample_eligible,
    )

    # Cache the compiled sampler keyed on the planner/compile source hash
    # (a stale cache would silently measure an old compiled program), under
    # the repo rather than world-writable /tmp. --fresh forces a recompile.
    import hashlib

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    h = hashlib.sha256()
    for rel in ("tsim_tpu/zx/decompose.py", "tsim_tpu/compile/stabrank.py",
                "tsim_tpu/compile/pipeline.py", "tsim_tpu/compile/compile.py"):
        with open(os.path.join(repo, rel), "rb") as fh:
            h.update(fh.read())
    cache_dir = os.path.join(repo, ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    ckpt = os.path.join(
        cache_dir, f"roofline_{wl}_{h.hexdigest()[:12]}.ckpt"
    )
    if os.path.exists(ckpt) and "--fresh" not in sys.argv:
        smp = CompiledDetectorSampler.load(ckpt)
    else:
        print(f"compiling workload {wl}...", flush=True)
        if wl == "d3dist":
            c = distillation_d3(p=0.05)
        else:
            c = cultivation_d3(p=0.001, checks=int(wl))
        smp = c.compile_detector_sampler(seed=0)
        smp.save(ckpt)

    rng = np.random.default_rng(0)
    R = 16
    rows = []
    tot_t = tot_exec = tot_use = 0.0
    for ci, comp in enumerate(smp._program.components):
        for ri, rung in enumerate(comp.compiled_scalar_graphs):
            if rung.num_graphs == 0:
                continue
            P = max(rung.n_params, 8)
            xs = [
                jax.device_put(
                    rng.integers(0, 2, size=(B, rung.n_params)).astype(
                        np.uint8
                    )
                )
                for _ in range(R)
            ]
            if not sample_eligible(rung):
                print(f"  c{ci} r{ri}: ineligible (exact path)", flush=True)
                continue
            t = timed(lambda v, r=rung: evaluate_abs_sample_f32(r, v), xs)
            fe, fu = _bucket_flops(rung, P)
            rows.append((ci, ri, rung.num_graphs, P, t, fe, fu))
            tot_t += t
            tot_exec += fe * B
            tot_use += fu * B

    print(f"\nbatch {B}; per-rung f32 sampling kernel (best-of-5):")
    print("  comp rung     G    P    ms   exec-TF/s useful-TF/s")
    for ci, ri, G, P, t, fe, fu in rows:
        print(
            f"  c{ci:<3} r{ri:<3} {G:>6} {P:>4} {t * 1e3:7.2f} "
            f"{fe * B / t / 1e12:9.2f} {fu * B / t / 1e12:10.2f}"
        )
    if tot_t:
        print(
            f"\nladder total: {tot_t * 1e3:.1f} ms/batch "
            f"({B / tot_t:,.0f} shots/s eval-only)"
        )
        print(
            f"  executed MXU: {tot_exec / tot_t / 1e12:.1f} TFLOP/s "
            f"({100 * tot_exec / tot_t / V5E_BF16_PEAK:.1f}% of v5e bf16 peak)"
        )
        print(
            f"  useful  MXU: {tot_use / tot_t / 1e12:.1f} TFLOP/s "
            f"(MFU {100 * tot_use / tot_t / V5E_BF16_PEAK:.1f}%; "
            f"padding overhead {tot_exec / max(tot_use, 1):.2f}x)"
        )


if __name__ == "__main__":
    main()
