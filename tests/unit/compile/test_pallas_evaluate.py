"""Fused Pallas evaluate kernel matches the XLA exact path bit-for-bit.

Runs in Pallas interpret mode on CPU; the same kernel compiles via Mosaic
on TPU.
"""

import jax
import numpy as np
import pytest

import tsim_tpu
from tsim_tpu.compile.evaluate import evaluate_abs
from tsim_tpu.compile.pallas_evaluate import evaluate_abs_fused


def _all_csgs(circuit_text, limit=2, **kwargs):
    """A few representative compiled graphs (interpret mode is slow)."""
    sampler = tsim_tpu.Circuit(circuit_text).compile_sampler(seed=0, **kwargs)
    csgs = [
        csg
        for comp in sampler._program.components
        for csg in comp.compiled_scalar_graphs
    ]
    # Interpret-mode cost scales with the term-loop length; keep the term
    # count modest but still exercise multi-graph sums and every family.
    csgs = [
        c for c in csgs
        if c.node_phases.phases.shape[0] + c.phase_pairs.alpha.shape[0] <= 5
    ]
    csgs.sort(key=lambda c: c.num_graphs)
    if len(csgs) > limit:
        idx = np.linspace(0, len(csgs) - 1, limit).astype(int)
        csgs = [csgs[i] for i in idx]
    return csgs


def _check(csg, n_params_used, batch=9):
    rng = np.random.default_rng(42)
    # The compiled graph knows its parameter count; feed random bits.
    p = csg.n_params
    vals = rng.integers(0, 2, size=(batch, p)).astype(np.uint8)
    want = np.asarray(evaluate_abs(csg, vals))
    got = np.asarray(evaluate_abs_fused(csg, vals))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_t_gate_circuit():
    for csg in _all_csgs("H 0\nT 0\nX_ERROR(0.2) 0\nH 0\nM 0"):
        _check(csg, csg.n_params)


def test_multi_t_and_noise():
    text = (
        "H 0\nH 1\nT 0\nT 1\nCNOT 0 1\nDEPOLARIZE1(0.3) 0 1\n"
        "H 1\nM 0 1\nDETECTOR rec[-1] rec[-2]"
    )
    seen = 0
    for csg in _all_csgs(text, limit=1):
        _check(csg, csg.n_params)
        seen += 1
    assert seen > 0


def test_pair_terms():
    text = "H 0\nH 1\nCZ 0 1\nT 0\nX_ERROR(0.25) 1\nH 0 1\nM 0 1"
    seen = 0
    for csg in _all_csgs(text, limit=1):
        _check(csg, csg.n_params)
        seen += 1
    assert seen > 0


@pytest.mark.parametrize("seed", [5])
def test_random_clifford_t(seed):
    from tests.helpers.gen import gen_circuit_text

    weights = {"T": 3, "S": 1, "H": 3, "CNOT": 2, "X_ERROR(0.4)": 1,
               "DEPOLARIZE1(0.4)": 1}
    text = gen_circuit_text(3, 14, gate_weights=weights, seed=seed)
    for csg in _all_csgs(text, limit=1):
        _check(csg, csg.n_params)
