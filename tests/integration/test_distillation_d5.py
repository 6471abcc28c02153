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


def test_d5_noisy_detector_rates_scale_with_noise():
    rates = []
    for p in (0.01, 0.05):
        sampler = distillation_d5(p=p).compile_detector_sampler(seed=1)
        det = sampler.sample(1500, batch_size=1500)
        rates.append(det.mean())
    assert 0 < rates[0] < rates[1] < 0.5
