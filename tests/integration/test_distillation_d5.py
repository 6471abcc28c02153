"""d=5 (85-qubit) magic state distillation: compile + sampling sanity.

No statevector oracle exists at 85 qubits; like the reference's own d5
coverage this pins the structural invariants (graph/term counts stay
bounded, compile succeeds) and physical sanity: noiseless inputs trigger
no detectors, and detector rates grow monotonically with the noise rate.
"""

import numpy as np

from tsim_tpu.models.distillation import distillation_d3, distillation_d5

from ..helpers import requires_native_planner


def _rung_counts(sampler):
    return [
        csg.num_graphs
        for comp in sampler._program.components
        for csg in comp.compiled_scalar_graphs
    ]


def test_d5_compiles_and_noiseless_detectors_are_silent():
    c = distillation_d5(p=0.0)
    assert c.num_qubits == 85
    sampler = c.compile_detector_sampler(seed=0)
    det = sampler.sample(200, batch_size=200)
    assert det.shape == (200, 40)
    assert det.sum() == 0


@requires_native_planner()
def test_d3_term_count_pin():
    """Planner regression pin (seed 0): the d=3 distillation benchmark's
    largest rung stays at <=103 terms — below the reference's published
    148 (reference ``docs/benchmarks.svg`` panel 1). Term count drives
    sampling throughput directly; heuristic-cap changes that inflate it
    must fail here, not in a benchmark three rounds later."""
    sampler = distillation_d3(p=0.05).compile_detector_sampler(seed=0)
    counts = _rung_counts(sampler)
    assert max(counts) <= 103, counts
    assert sum(counts) <= 278, counts


@requires_native_planner()
def test_d5_term_count_pin():
    """Planner regression pin (seed 0): d=5 distillation largest rung
    <=138 (reference panel 2 publishes 147)."""
    sampler = distillation_d5(p=0.04).compile_detector_sampler(seed=0)
    counts = _rung_counts(sampler)
    assert max(counts) <= 138, counts
    assert sum(counts) <= 332, counts


def test_d5_noisy_detector_rates_plausible():
    sampler = distillation_d5(p=0.04).compile_detector_sampler(seed=1)
    det = sampler.sample(600, batch_size=600)
    assert 0.005 < det.mean() < 0.5
