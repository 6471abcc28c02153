"""Fused Pallas evaluate kernel matches the XLA exact path.

The kernel's real target is Mosaic on TPU; on CPU it runs in Pallas
interpret mode. The XLA CPU backend in this image compiles interpret-mode
emulations of chained exact-reduction steps pathologically slowly (minutes
per kernel once more than ~3 canonicalization steps chain), so CPU CI keeps
one fast smoke test per family and the full fused-vs-XLA sweep is gated to
TPU (run ``dev/tpu_kernel_check.py`` on hardware; the driver's bench also
exercises every kernel shape of the headline workload).
"""

import os

import jax
import numpy as np
import pytest

import tsim_tpu
from tsim_tpu.compile.compile import compile_scalar_graphs
from tsim_tpu.compile.evaluate import evaluate_abs
from tsim_tpu.compile.pallas_evaluate import evaluate_abs_fused
from tsim_tpu.zx.graph import ZXGraph

ON_TPU = jax.default_backend() == "tpu"
RUN_SLOW = os.environ.get("TSIM_TPU_RUN_PALLAS_TESTS", "") == "1"


def _check(csg, batch=9):
    rng = np.random.default_rng(42)
    vals = rng.integers(0, 2, size=(batch, csg.n_params)).astype(np.uint8)
    want = np.asarray(evaluate_abs(csg, vals))
    got = np.asarray(evaluate_abs_fused(csg, vals))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def _scalar_csg(build):
    g = ZXGraph()
    build(g.scalar)
    return compile_scalar_graphs([g], ["f0", "f1"])


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


def _all_csgs(circuit_text, limit=2, **kwargs):
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


@pytest.mark.skipif(
    not (ON_TPU or RUN_SLOW),
    reason="interpret-mode XLA CPU compile is pathologically slow on "
    "multi-term kernels; full sweep runs on TPU",
)
@pytest.mark.parametrize(
    "text",
    [
        "H 0\nT 0\nX_ERROR(0.2) 0\nH 0\nM 0",
        "H 0\nH 1\nT 0\nT 1\nCNOT 0 1\nDEPOLARIZE1(0.3) 0 1\n"
        "H 1\nM 0 1\nDETECTOR rec[-1] rec[-2]",
        "H 0\nH 1\nCZ 0 1\nT 0\nX_ERROR(0.25) 1\nH 0 1\nM 0 1",
    ],
)
def test_circuit_kernels(text):
    for csg in _all_csgs(text, limit=3):
        _check(csg)


def _multi_family_csg(n_graphs):
    """All four term families across ``n_graphs`` graphs with small
    per-family term counts — interpret-mode-affordable on CPU (the CPU
    blowup is chained canonicalization DEPTH, not family coverage)."""
    from fractions import Fraction

    graphs = []
    for k in range(1, n_graphs + 1):
        g = ZXGraph()
        g.scalar.add_node(Fraction(1, 4) * (2 * (k % 3) + 1), [f"f{k % 2}"])
        if k % 2:
            g.scalar.add_phase_pair(1, 7, ["f0"], ["f1"])
        if k % 3 == 0:
            g.scalar.add_halfpi(k % 8, ["f1"])
        if k % 4 == 0:
            g.scalar.add_pi_pair(frozenset({"f0"}), frozenset({"f1"}))
        g.scalar.power2 -= k % 3
        graphs.append(g)
    return compile_scalar_graphs(graphs, ["f0", "f1"])


def test_wide_layout_multi_family_cpu():
    """Wide-layout exact kernel, every term family, runs in every CPU CI
    pass (>= 24 graphs selects the wide layout)."""
    _check(_multi_family_csg(30))


def test_small_layout_multi_family_cpu():
    """Transposed small-G exact kernel, every term family, CPU CI."""
    _check_small(_multi_family_csg(23))


def _check_small(csg, batch=9):
    from tsim_tpu.compile.pallas_evaluate import evaluate_abs_fused_small

    rng = np.random.default_rng(7)
    vals = rng.integers(0, 2, size=(batch, csg.n_params)).astype(np.uint8)
    want = np.asarray(evaluate_abs(csg, vals))
    got = np.asarray(evaluate_abs_fused_small(csg, vals))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-7)


def test_small_kernel_node_phase():
    _check_small(_scalar_csg(lambda s: s.add_node(0.25, ["f0"])))


def test_small_kernel_mixed_families():
    def build(s):
        s.add_node(0.25, ["f0"])
        s.add_halfpi(1, ["f1"])
        s.add_pi_pair(frozenset({"f0"}), frozenset({"f1"}))
        s.add_phase_pair(1, 7, ["f0"], ["f1"])

    _check_small(_scalar_csg(build))


@pytest.mark.parametrize("n_graphs", [9, 17])
def test_small_kernel_multi_graph(n_graphs):
    """Several graphs with differing term counts through the transposed
    kernel (exercises masking, the sublane tree sum, and G % 8 != 0).

    G=9 (Gp=16) and G=17 (Gp=24) are the shapes that require a full-axis
    graph tile: a gt=8 tile over a padded 16/24 graph axis violates the
    Mosaic last-dim block rule and fails TPU lowering."""
    from fractions import Fraction

    graphs = []
    for k in range(1, n_graphs + 1):
        g = ZXGraph()
        for j in range(k % 3 + 1):
            g.scalar.add_node(Fraction(1, 4) * (2 * j + 1), [f"f{j % 2}"])
        if k % 2:
            g.scalar.add_halfpi(1, ["f0"])
        g.scalar.add_power(k % 5 - 2)
        graphs.append(g)
    _check_small(compile_scalar_graphs(graphs, ["f0", "f1"]))


def test_pack_params_layout():
    """Term-packed weights: column t*gt+g of tile j is term t of graph
    j*gt+g (the lane-aligned slicing contract of the packed kernel)."""
    import numpy as np

    from tsim_tpu.compile.pallas_sample import _pack_params

    T, Gp, P, gt = 3, 16, 5, 8
    arr = np.arange(T * Gp * P, dtype=np.int32).reshape(T, Gp, P)
    out = _pack_params(arr, gt)
    assert out.shape == (Gp // gt, P, T * gt)
    for j in range(Gp // gt):
        for t in range(T):
            for g in range(gt):
                np.testing.assert_array_equal(
                    out[j, :, t * gt + g], arr[t, j * gt + g, :]
                )
