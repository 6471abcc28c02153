"""Sampling-mode f32 kernel matches the exact XLA path to f32 tolerance.

Unlike the exact kernels (whose interpret-mode emulation of chained
reduce steps compiles pathologically slowly on CPU), the f32 product
body is plain float arithmetic, so the full sweep runs everywhere —
this is the CI coverage for the TPU sampling hot path.
"""

import numpy as np
import pytest

import tsim_tpu
from tsim_tpu.compile.compile import compile_scalar_graphs
from tsim_tpu.compile.evaluate import evaluate_abs
from tsim_tpu.compile.pallas_sample import (
    evaluate_abs_sample_f32,
    sample_eligible,
)
from tsim_tpu.zx.graph import ZXGraph


def _check(csg, batch=9, seed=42):
    rng = np.random.default_rng(seed)
    vals = rng.integers(0, 2, size=(batch, csg.n_params)).astype(np.uint8)
    want = np.asarray(evaluate_abs(csg, vals))
    got = np.asarray(evaluate_abs_sample_f32(csg, vals))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def _scalar_csg(build, params=("f0", "f1")):
    g = ZXGraph()
    build(g.scalar)
    return compile_scalar_graphs([g], list(params))


def test_node_phase_term():
    _check(_scalar_csg(lambda s: s.add_node(0.25, ["f0"])))


def test_pi_product_term():
    _check(
        _scalar_csg(
            lambda s: s.add_pi_pair(frozenset({"f0"}), frozenset({"f1"}))
        )
    )


def test_phase_pair_term():
    _check(_scalar_csg(lambda s: s.add_phase_pair(1, 7, ["f0"], ["f1"])))


def test_halfpi_term():
    _check(_scalar_csg(lambda s: s.add_halfpi(1, ["f0"])))


def test_mixed_families():
    def build(s):
        s.add_node(0.25, ["f0"])
        s.add_node(0.75, ["f1"])
        s.add_halfpi(3, ["f0"])
        s.add_pi_pair(frozenset({"f0"}), frozenset({"f1"}))
        s.add_phase_pair(1, 7, ["f0"], ["f1"])
        s.add_phase_pair(3, 5, ["f1"], ["f0"])

    _check(_scalar_csg(build))


@pytest.mark.parametrize("n_graphs", [9, 17, 40])
def test_multi_graph(n_graphs):
    """Exercises both layouts: transposed (< 24 graphs) and wide (>= 24),
    with non-multiple-of-8 graph counts (padding columns must sum to 0)."""
    from fractions import Fraction

    graphs = []
    for k in range(1, n_graphs + 1):
        g = ZXGraph()
        for j in range(k % 3 + 1):
            g.scalar.add_node(Fraction(1, 4) * (2 * j + 1), [f"f{j % 2}"])
        if k % 2:
            g.scalar.add_phase_pair(1, 7, ["f0"], ["f1"])
        if k % 5 == 0:
            g.scalar.add_halfpi(k % 8, ["f1"])
        g.scalar.power2 -= k % 3
        graphs.append(g)
    csg = compile_scalar_graphs(graphs, ["f0", "f1"])
    _check(csg)


def _all_csgs(circuit_text, limit=3, **kwargs):
    sampler = tsim_tpu.Circuit(circuit_text).compile_sampler(seed=0, **kwargs)
    csgs = [
        csg
        for comp in sampler._program.components
        for csg in comp.compiled_scalar_graphs
    ]
    csgs.sort(key=lambda c: c.num_graphs)
    if len(csgs) > limit:
        idx = np.linspace(0, len(csgs) - 1, limit).astype(int)
        csgs = [csgs[i] for i in idx]
    return csgs


@pytest.mark.parametrize(
    "text",
    [
        "H 0\nT 0\nX_ERROR(0.2) 0\nH 0\nM 0",
        "H 0\nH 1\nT 0\nT 1\nCNOT 0 1\nDEPOLARIZE1(0.3) 0 1\n"
        "H 1\nM 0 1\nDETECTOR rec[-1] rec[-2]",
        "H 0\nH 1\nCZ 0 1\nT 0\nX_ERROR(0.25) 1\nH 0 1\nM 0 1",
        "H 0\nS 0\nT 0\nCX 0 1\nT 1\nY_ERROR(0.1) 0\nH 0\nM 0 1",
    ],
)
def test_circuit_kernels(text):
    """Real compiled rungs (ladder plugs) through the f32 kernel."""
    for csg in _all_csgs(text):
        _check(csg)


def test_eligibility_gate():
    # A tiny circuit is eligible; an absurd power2 is not.
    csg = _scalar_csg(lambda s: s.add_node(0.25, ["f0"]))
    assert sample_eligible(csg)
    g = ZXGraph()
    g.scalar.add_node(0.25, ["f0"])
    g.scalar.power2 = 400
    big = compile_scalar_graphs([g], ["f0"])
    assert not sample_eligible(big)


def test_large_common_prefactor_bias_fold():
    """A deep rung's graphs share a large negative power2 (grown
    cultivation full plug: [-89, -73]); the common scale is folded out of
    the kernel and restored after the sum, so the circuit stays eligible
    and exact — without the fold, per-graph products would sit ~2^-100
    and their squares would flush to zero in f32."""
    from fractions import Fraction

    graphs = []
    for k in range(30):
        g = ZXGraph()
        g.scalar.add_node(Fraction(1, 4) * (2 * (k % 4) + 1), [f"f{k % 2}"])
        if k % 3 == 0:
            g.scalar.add_phase_pair(1, 7, ["f0"], ["f1"])
        g.scalar.power2 = -85 + (k % 7)
        graphs.append(g)
    csg = compile_scalar_graphs(graphs, ["f0", "f1"])
    assert sample_eligible(csg)
    _check(csg)

    # And positive-scale bias.
    for g in graphs:
        g.scalar.power2 += 150
    csg2 = compile_scalar_graphs(graphs, ["f0", "f1"])
    assert sample_eligible(csg2)
    _check(csg2)


def test_sampler_uses_f32_mode(monkeypatch):
    """End-to-end: forcing f32 sampling mode preserves the sampled
    distribution (same circuit, f32 vs exact eval, statistically close)."""
    import tsim_tpu.compile.pallas_sample as ps

    text = "H 0\nT 0\nX_ERROR(0.2) 0\nH 0\nM 0\nH 1\nT 1\nH 1\nM 1"
    shots = 4096
    monkeypatch.setattr(ps, "_SAMPLE_MODE", "exact")
    s_exact = (
        tsim_tpu.Circuit(text).compile_sampler(seed=3).sample(shots)
    )
    monkeypatch.setattr(ps, "_SAMPLE_MODE", "f32")
    s_f32 = tsim_tpu.Circuit(text).compile_sampler(seed=3).sample(shots)
    # Same seed + same Bernoulli draws + eval error << draw granularity
    # means the bits should match almost everywhere.
    assert (s_exact != s_f32).mean() < 0.01
