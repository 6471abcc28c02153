"""Cultivation model family: oracle validation + compiled-sampler agreement.

The d=3 cultivation benchmark circuit (reference benchmarks panel 3) is
validated physically: noiseless checks and stabilizer detectors are
deterministic zero, and the logical X readout of |H_XY> has mean
(1 - 1/sqrt(2))/2.
"""

import numpy as np

from tsim_tpu.external.vec_sim.vec_sampler import VecSampler
from tsim_tpu.models.cultivation import cultivation_d3, cultivation_logical

from ..helpers import requires_native_planner

OBS_MEAN = (1 - 1 / np.sqrt(2)) / 2  # 0.1464...


def test_logical_cultivation_oracle():
    c = cultivation_logical(p=0.0, checks=2, noise=0.0)
    rec, dets, obs = VecSampler(c, seed=0).sample(400)
    assert np.asarray(dets).sum() == 0
    assert abs(np.asarray(obs).mean() - OBS_MEAN) < 0.05


def test_encoded_cultivation_oracle():
    c = cultivation_d3(p=0.0, checks=1, stabilizer_rounds=1, noise=0.0)
    assert c.num_qubits == 8
    assert c.num_detectors == 10
    rec, dets, obs = VecSampler(c, seed=1).sample(150)
    assert np.asarray(dets).sum() == 0
    assert abs(np.asarray(obs).mean() - OBS_MEAN) < 0.09


def test_compiled_sampler_matches_oracle_statistics():
    c = cultivation_logical(p=0.02, checks=1, noise=0.002)
    sampler = c.compile_detector_sampler(seed=3)
    det, obs = sampler.sample(6000, batch_size=6000, separate_observables=True)
    rec, dets_o, obs_o = VecSampler(c, seed=4).sample(6000)
    det_rate, det_rate_o = det.mean(), np.asarray(dets_o).mean()
    obs_rate, obs_rate_o = obs.mean(), np.asarray(obs_o).mean()
    # 4-sigma binomial agreement on both rates.
    for got, exp in [(det_rate, det_rate_o), (obs_rate, obs_rate_o)]:
        sigma = np.sqrt(max(exp * (1 - exp), 1e-4) / 6000)
        assert abs(got - exp) < 4 * sigma + 1e-3, (got, exp)


def test_noiseless_compiled_detectors_deterministic():
    c = cultivation_logical(p=0.0, checks=2, noise=0.0)
    sampler = c.compile_detector_sampler(seed=5)
    det, obs = sampler.sample(3000, batch_size=3000, separate_observables=True)
    assert det.sum() == 0
    assert abs(obs.mean() - OBS_MEAN) < 0.03


def test_cultivation_term_count_budget():
    """The planned joint pair-projector decomposition keeps the d=3
    cultivation benchmark far below the reference's published 1024-term
    workload (reference ``docs/benchmarks.svg`` panel 3): the full ladder
    compiles to a few hundred graphs total, with the largest plugged
    circuit at 2^rank = 128 terms. Both are regression-pinned (a planner
    change that inflates the largest rung directly regresses sampling
    throughput)."""
    sampler = cultivation_d3(p=0.001).compile_detector_sampler(seed=0)
    counts = [
        csg.num_graphs
        for comp in sampler._program.components
        for csg in comp.compiled_scalar_graphs
    ]
    assert max(counts) <= 128, counts
    assert sum(counts) < 1200, counts


@requires_native_planner()
def test_cultivation_2check_term_count_pin():
    """2-check cultivation pin (seed 0): largest rung <=320, total <=1100
    (measured with the native planner: 307 / 1048 — far below the
    reference's published 1024-term workload and the old greedy planner's
    2048)."""
    sampler = cultivation_d3(p=0.001, checks=2).compile_detector_sampler(seed=0)
    counts = [
        csg.num_graphs
        for comp in sampler._program.components
        for csg in comp.compiled_scalar_graphs
    ]
    assert max(counts) <= 320, counts
    assert sum(counts) <= 1100, counts
