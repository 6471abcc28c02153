"""Device channel sampler matches the host geometric-skip sampler."""

import jax
import numpy as np

from tsim_tpu.noise.channels import (
    ChannelSampler,
    error_probs,
    heralded_pauli_channel_1_probs,
    pauli_channel_1_probs,
    pauli_channel_2_probs,
)
from tsim_tpu.noise.device_channels import DeviceChannelSampler


def _compare(channel_probs, transform, n=200_000, tol=4.5):
    host = ChannelSampler(channel_probs, transform, seed=11)
    dev = DeviceChannelSampler(host)
    f_host = host.sample(n)
    f_dev = np.asarray(dev.sample(jax.random.key(7), n))
    assert f_dev.shape == f_host.shape
    a, b = f_dev.mean(axis=0), f_host.mean(axis=0)
    se = np.sqrt(b * (1 - b) / n + a * (1 - a) / n) + 1e-9
    assert (np.abs(a - b) / se).max() < tol, (a, b)


def test_single_error_channel():
    _compare([error_probs(0.3)], np.eye(1, dtype=np.uint8))


def test_mixed_channels_with_shared_columns():
    # 3 e-bits: two mapping to the same f-column (fold), one independent.
    transform = np.array([[1, 1, 0], [0, 0, 1]], dtype=np.uint8)
    _compare([error_probs(0.2), error_probs(0.4), error_probs(0.25)], transform)


def test_multibit_channels():
    t = np.zeros((5, 9), dtype=np.uint8)
    t[:2, :2] = np.eye(2)  # pc1
    t[:4, 2:6] = np.eye(4)  # pc2
    t[2:5, 6:9] = np.eye(3)  # heralded
    _compare(
        [
            pauli_channel_1_probs(0.1, 0.2, 0.15),
            pauli_channel_2_probs(*([0.05] * 15)),
            heralded_pauli_channel_1_probs(0.1, 0.05, 0.05, 0.1),
        ],
        t,
    )


def test_zero_noise():
    host = ChannelSampler([error_probs(0.0)], np.eye(1, dtype=np.uint8), seed=1)
    dev = DeviceChannelSampler(host)
    f = np.asarray(dev.sample(jax.random.key(0), 64))
    assert f.shape == (64, 1) and not f.any()
