"""Channel algebra tests (bit layouts, simplification, sampling)."""

import numpy as np
import pytest

from tsim_tpu.noise.channels import (
    Channel,
    ChannelSampler,
    absorb_subset_channels,
    correlated_error_probs,
    error_probs,
    expand_channel,
    fold_duplicate_channel_bits,
    heralded_pauli_channel_1_probs,
    merge_identical_channels,
    normalize_channels,
    pauli_channel_1_probs,
    pauli_channel_2_probs,
    reduce_null_bits,
    simplify_channels,
    xor_convolve,
)


def test_prob_constructors():
    np.testing.assert_allclose(error_probs(0.25), [0.75, 0.25])
    p1 = pauli_channel_1_probs(0.1, 0.2, 0.3)
    np.testing.assert_allclose(p1, [0.4, 0.3, 0.1, 0.2])  # I, Z, X, Y
    h = heralded_pauli_channel_1_probs(0.1, 0.05, 0.02, 0.03)
    np.testing.assert_allclose(h[0], 1 - 0.2)
    assert h[1] == 0.1 and h[5] == 0.05 and h[7] == 0.02 and h[3] == 0.03
    p2 = pauli_channel_2_probs(*range(1, 16))
    # index z_i + 2 x_i + 4 z_j + 8 x_j; pzx: Z on i, X on j -> 1 + 8 = 9
    assert p2[9] == 13  # pzx is the 13th argument
    c = correlated_error_probs([0.5, 0.5])
    np.testing.assert_allclose(c, [0.25, 0.5, 0.25, 0.0])


def test_xor_convolve():
    a = np.array([0.9, 0.1])
    b = np.array([0.8, 0.2])
    out = xor_convolve(a, b)
    np.testing.assert_allclose(out, [0.9 * 0.8 + 0.1 * 0.2, 0.9 * 0.2 + 0.1 * 0.8])


def test_reduce_null_bits():
    ch = Channel(probs=pauli_channel_1_probs(0.1, 0.0, 0.2), unique_col_ids=(0, 1))
    (out,) = reduce_null_bits([ch], null_col_id=0)
    # bit 0 (Z) marginalized out: remaining bit is X component
    assert out.unique_col_ids == (1,)
    np.testing.assert_allclose(out.probs, [0.9, 0.1])
    # channel entirely null is removed
    ch2 = Channel(probs=error_probs(0.3), unique_col_ids=(0,))
    assert reduce_null_bits([ch2], null_col_id=0) == []


def test_normalize_and_fold():
    ch = Channel(probs=pauli_channel_1_probs(0.1, 0.0, 0.2), unique_col_ids=(2, 1))
    (out,) = normalize_channels([ch])
    assert out.unique_col_ids == (1, 2)
    # swapped axes: bit0 now col1 (was X), bit1 col2 (was Z)
    np.testing.assert_allclose(out.probs, [0.7, 0.1, 0.2, 0.0])

    dup = Channel(probs=pauli_channel_1_probs(0.1, 0.0, 0.2), unique_col_ids=(1, 1))
    (folded,) = fold_duplicate_channel_bits([dup])
    assert folded.unique_col_ids == (1,)
    np.testing.assert_allclose(folded.probs, [0.7 + 0.0, 0.2 + 0.1])


def test_merge_and_absorb():
    a = Channel(probs=error_probs(0.1), unique_col_ids=(1,))
    b = Channel(probs=error_probs(0.2), unique_col_ids=(1,))
    (merged,) = merge_identical_channels([a, b])
    np.testing.assert_allclose(merged.probs, xor_convolve(a.probs, b.probs))

    big = Channel(probs=pauli_channel_1_probs(0.1, 0.05, 0.2), unique_col_ids=(1, 2))
    small = Channel(probs=error_probs(0.3), unique_col_ids=(1,))
    out = absorb_subset_channels([big, small])
    assert len(out) == 1
    expanded = expand_channel(small, (1, 2))
    np.testing.assert_allclose(out[0].probs, xor_convolve(big.probs, expanded.probs))


def test_channel_sampler_statistics():
    transform = np.array([[1, 1, 0], [0, 1, 1]], dtype=np.uint8)
    probs = [error_probs(0.3), error_probs(0.25), error_probs(0.4)]
    cs = ChannelSampler(probs, transform, seed=7)
    out = cs.sample(200000)
    # f0 = e0 ^ e1, f1 = e1 ^ e2
    p_e = [0.3, 0.25, 0.4]
    exp_f0 = p_e[0] * (1 - p_e[1]) + p_e[1] * (1 - p_e[0])
    exp_f1 = p_e[1] * (1 - p_e[2]) + p_e[2] * (1 - p_e[1])
    np.testing.assert_allclose(out.mean(axis=0), [exp_f0, exp_f1], atol=0.006)


def test_channel_sampler_correlations():
    # A two-bit channel hitting distinct columns keeps correlations.
    transform = np.eye(2, dtype=np.uint8)
    probs = [pauli_channel_1_probs(0.0, 0.3, 0.0)]  # only Y: both bits together
    cs = ChannelSampler(probs, transform, seed=3)
    out = cs.sample(100000)
    assert abs(out[:, 0].mean() - 0.3) < 0.01
    np.testing.assert_array_equal(out[:, 0], out[:, 1])


def test_channel_validation():
    with pytest.raises(ValueError, match="sum to 1"):
        Channel(probs=np.array([0.5, 0.4]), unique_col_ids=(0,))
    with pytest.raises(ValueError, match="lie in"):
        Channel(probs=np.array([1.5, -0.5]), unique_col_ids=(0,))
