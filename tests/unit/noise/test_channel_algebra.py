"""Channel simplification algebra: exhaustive semantics tests.

Mirrors the reference's channel-algebra coverage (reference
``test/unit/noise/test_channels.py``, 71 tests): every simplification step
must preserve the induced distribution over reduced error patterns
``f = XOR_channels (bits @ signatures)``, verified against brute-force
enumeration.
"""

import itertools

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


def f_distribution(channels, signature_matrix):
    """Brute-force distribution over f patterns from independent channels."""
    num_f = signature_matrix.shape[1]
    dist = {(0,) * num_f: 1.0}
    for ch in channels:
        ids = np.asarray(ch.unique_col_ids)
        new = {}
        for outcome, p in enumerate(ch.probs):
            if p == 0:
                continue
            bits = (outcome >> np.arange(len(ids))) & 1
            pat = tuple((bits @ signature_matrix[ids]) % 2)
            for f, q in dist.items():
                nf = tuple(a ^ b for a, b in zip(f, pat))
                new[nf] = new.get(nf, 0.0) + q * p
        dist = new
    return dist


def assert_same_f_dist(chs_a, chs_b, sig, atol=1e-12):
    da = f_distribution(chs_a, sig)
    db = f_distribution(chs_b, sig)
    keys = set(da) | set(db)
    for k in keys:
        assert abs(da.get(k, 0.0) - db.get(k, 0.0)) < atol, (k, da.get(k), db.get(k))


SIG = np.array(
    [[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0], [1, 0, 1]], dtype=np.uint8
)  # signature 0 is the null column


class TestConstructors:
    def test_error_probs(self):
        np.testing.assert_allclose(error_probs(0.125), [0.875, 0.125])

    def test_pauli_channel_1_layout(self):
        p = pauli_channel_1_probs(0.1, 0.2, 0.3)
        # bit0 = Z, bit1 = X; Y sets both
        assert p[1] == 0.3  # Z
        assert p[2] == 0.1  # X
        assert p[3] == 0.2  # Y
        assert np.isclose(p.sum(), 1.0)

    def test_pauli_channel_2_layout(self):
        ps = [0.0] * 15
        ps[4] = 0.25  # pxx
        p = pauli_channel_2_probs(*ps)
        # X on qubit i -> bit1; X on qubit j -> bit3
        assert p[2 + 8] == 0.25
        assert p[0] == 0.75

    def test_pauli_channel_2_all_named(self):
        names = "ix iy iz xi xx xy xz yi yx yy yz zi zx zy zz".split()
        bit = {"i": (0, 0), "z": (1, 0), "x": (0, 1), "y": (1, 1)}
        for k, name in enumerate(names):
            ps = [0.0] * 15
            ps[k] = 0.5
            p = pauli_channel_2_probs(*ps)
            zi, xi = bit[name[0]]
            zj, xj = bit[name[1]]
            assert p[zi + 2 * xi + 4 * zj + 8 * xj] == 0.5, name

    def test_heralded_layout(self):
        p = heralded_pauli_channel_1_probs(0.1, 0.2, 0.3, 0.35)
        assert np.isclose(p[0], 0.05)
        assert p[1] == 0.1  # herald only
        assert p[3] == 0.35  # herald + Z
        assert p[5] == 0.2  # herald + X
        assert p[7] == 0.3  # herald + Y
        assert np.isclose(p.sum(), 1.0)

    def test_correlated_chain(self):
        p = correlated_error_probs([0.5, 0.5])
        # ELSE chain: P(first) = 0.5, P(second) = 0.5 * 0.5
        assert p[1] == 0.5
        assert p[2] == 0.25
        assert p[0] == 0.25
        assert p[3] == 0.0

    def test_correlated_chain_single(self):
        p = correlated_error_probs([0.2])
        np.testing.assert_allclose(p, [0.8, 0.2])


class TestChannelValidation:
    def test_rejects_negative(self):
        with pytest.raises(ValueError, match="lie in"):
            Channel(probs=np.array([1.2, -0.2]), unique_col_ids=(1,))

    def test_rejects_unnormalized(self):
        with pytest.raises(ValueError, match="sum to 1"):
            Channel(probs=np.array([0.5, 0.4]), unique_col_ids=(1,))

    def test_num_bits(self):
        ch = Channel(probs=np.full(8, 0.125), unique_col_ids=(1, 2, 3))
        assert ch.num_bits == 3


class TestXorConvolve:
    def test_identity(self):
        a = np.array([0.7, 0.3])
        np.testing.assert_allclose(xor_convolve(a, np.array([1.0, 0.0])), a)

    def test_two_flips(self):
        a = np.array([0.9, 0.1])
        out = xor_convolve(a, a)
        np.testing.assert_allclose(out, [0.82, 0.18])

    def test_commutative(self):
        rng = np.random.default_rng(0)
        a = rng.dirichlet(np.ones(8))
        b = rng.dirichlet(np.ones(8))
        np.testing.assert_allclose(xor_convolve(a, b), xor_convolve(b, a))

    def test_associative(self):
        rng = np.random.default_rng(1)
        a, b, c = (rng.dirichlet(np.ones(4)) for _ in range(3))
        np.testing.assert_allclose(
            xor_convolve(xor_convolve(a, b), c), xor_convolve(a, xor_convolve(b, c))
        )

    def test_size_mismatch(self):
        with pytest.raises(ValueError):
            xor_convolve(np.ones(2) / 2, np.ones(4) / 4)


def _rand_channel(rng, ids):
    return Channel(
        probs=rng.dirichlet(np.ones(2 ** len(ids))), unique_col_ids=tuple(ids)
    )


class TestReduceNullBits:
    def test_no_null_id_is_noop(self):
        rng = np.random.default_rng(2)
        chs = [_rand_channel(rng, (1, 0, 2))]
        assert reduce_null_bits(chs, None) is chs or reduce_null_bits(chs, None) == chs

    def test_drops_all_null_channel(self):
        rng = np.random.default_rng(3)
        chs = [_rand_channel(rng, (0, 0))]
        assert reduce_null_bits(chs, 0) == []

    def test_marginalizes_null_bit(self):
        rng = np.random.default_rng(4)
        chs = [_rand_channel(rng, (1, 0, 2))]
        out = reduce_null_bits(chs, 0)
        assert out[0].unique_col_ids == (1, 2)
        assert_same_f_dist(chs, out, SIG)

    @pytest.mark.parametrize("seed", range(4))
    def test_preserves_f_distribution(self, seed):
        rng = np.random.default_rng(seed)
        ids = [tuple(rng.integers(0, 4, size=rng.integers(1, 4))) for _ in range(3)]
        chs = [_rand_channel(rng, i) for i in ids]
        assert_same_f_dist(chs, reduce_null_bits(chs, 0), SIG)

    def test_fortran_order_bit_semantics(self):
        # probs index i has bit b set iff (i >> b) & 1: marginalizing bit 0
        # of a 2-bit channel sums index pairs (0,1) and (2,3).
        probs = np.array([0.1, 0.2, 0.3, 0.4])
        ch = Channel(probs=probs, unique_col_ids=(0, 1))
        out = reduce_null_bits([ch], 0)[0]
        np.testing.assert_allclose(out.probs, [0.3, 0.7])


class TestNormalizeChannels:
    def test_sorts_ids(self):
        rng = np.random.default_rng(5)
        ch = _rand_channel(rng, (3, 1, 2))
        out = normalize_channels([ch])[0]
        assert out.unique_col_ids == (1, 2, 3)
        assert_same_f_dist([ch], [out], SIG)

    def test_permutation_correct(self):
        # channel: bit0 -> col 2, bit1 -> col 1. After sort, bit0 -> col 1.
        probs = np.array([0.0, 0.0, 1.0, 0.0])  # bit1 set always (col 1 fires)
        ch = Channel(probs=probs, unique_col_ids=(2, 1))
        out = normalize_channels([ch])[0]
        assert out.unique_col_ids == (1, 2)
        np.testing.assert_allclose(out.probs, [0.0, 1.0, 0.0, 0.0])

    @pytest.mark.parametrize("seed", range(4))
    def test_preserves_f_distribution(self, seed):
        rng = np.random.default_rng(10 + seed)
        perm = list(rng.permutation([1, 2, 3]))
        chs = [_rand_channel(rng, tuple(perm))]
        assert_same_f_dist(chs, normalize_channels(chs), SIG)


class TestFoldDuplicateBits:
    def test_folds_equal_signatures(self):
        rng = np.random.default_rng(6)
        ch = _rand_channel(rng, (1, 1))
        out = fold_duplicate_channel_bits([ch])[0]
        assert out.unique_col_ids == (1,)
        assert_same_f_dist([ch], [out], SIG)

    def test_fold_xor_semantics(self):
        # both bits set -> patterns cancel: outcome 3 contributes to f=0.
        probs = np.array([0.0, 0.0, 0.0, 1.0])
        ch = Channel(probs=probs, unique_col_ids=(1, 1))
        out = fold_duplicate_channel_bits([ch])[0]
        np.testing.assert_allclose(out.probs, [1.0, 0.0])

    @pytest.mark.parametrize("seed", range(4))
    def test_preserves_f_distribution(self, seed):
        rng = np.random.default_rng(20 + seed)
        ids = (1, 2, 1)
        chs = [_rand_channel(rng, ids)]
        assert_same_f_dist(chs, fold_duplicate_channel_bits(chs), SIG)


class TestExpandChannel:
    def test_expand_basic(self):
        rng = np.random.default_rng(7)
        ch = _rand_channel(rng, (1,))
        out = expand_channel(ch, (1, 2))
        assert out.unique_col_ids == (1, 2)
        assert_same_f_dist([ch], [out], SIG)

    def test_requires_sorted_source(self):
        rng = np.random.default_rng(8)
        with pytest.raises(ValueError, match="sorted"):
            expand_channel(_rand_channel(rng, (2, 1)), (1, 2, 3))

    def test_requires_sorted_target(self):
        rng = np.random.default_rng(8)
        with pytest.raises(ValueError, match="sorted"):
            expand_channel(_rand_channel(rng, (1, 2)), (3, 1, 2))

    def test_requires_strict_subset(self):
        rng = np.random.default_rng(8)
        with pytest.raises(ValueError, match="subset"):
            expand_channel(_rand_channel(rng, (1, 2)), (1, 2))

    def test_rejects_duplicate_target(self):
        rng = np.random.default_rng(8)
        with pytest.raises(ValueError, match="duplicates"):
            expand_channel(_rand_channel(rng, (1,)), (1, 2, 2))


class TestMergeIdentical:
    def test_merges_same_signature(self):
        a = Channel(probs=np.array([0.9, 0.1]), unique_col_ids=(1,))
        b = Channel(probs=np.array([0.8, 0.2]), unique_col_ids=(1,))
        out = merge_identical_channels([a, b])
        assert len(out) == 1
        np.testing.assert_allclose(out[0].probs, xor_convolve(a.probs, b.probs))

    def test_keeps_distinct_signatures(self):
        a = Channel(probs=np.array([0.9, 0.1]), unique_col_ids=(1,))
        b = Channel(probs=np.array([0.8, 0.2]), unique_col_ids=(2,))
        assert len(merge_identical_channels([a, b])) == 2

    @pytest.mark.parametrize("seed", range(3))
    def test_preserves_f_distribution(self, seed):
        rng = np.random.default_rng(30 + seed)
        chs = [_rand_channel(rng, (1, 2)) for _ in range(3)]
        assert_same_f_dist(chs, merge_identical_channels(chs), SIG)


class TestAbsorbSubsets:
    def test_absorbs_strict_subset(self):
        rng = np.random.default_rng(9)
        big = _rand_channel(rng, (1, 2))
        small = _rand_channel(rng, (1,))
        out = absorb_subset_channels([big, small])
        assert len(out) == 1
        assert out[0].unique_col_ids == (1, 2)
        assert_same_f_dist([big, small], out, SIG)

    def test_max_bits_gate(self):
        rng = np.random.default_rng(11)
        big = _rand_channel(rng, (1, 2, 3))
        small = _rand_channel(rng, (1,))
        out = absorb_subset_channels([big, small], max_bits=2)
        assert len(out) == 2

    @pytest.mark.parametrize("seed", range(3))
    def test_preserves_f_distribution(self, seed):
        rng = np.random.default_rng(40 + seed)
        chs = [
            _rand_channel(rng, (1, 2, 3)),
            _rand_channel(rng, (1, 3)),
            _rand_channel(rng, (2,)),
        ]
        assert_same_f_dist(chs, absorb_subset_channels(chs), SIG)


class TestSimplifyPipeline:
    @pytest.mark.parametrize("seed", range(6))
    def test_end_to_end_preserves_f_distribution(self, seed):
        rng = np.random.default_rng(50 + seed)
        chs = []
        for _ in range(4):
            k = int(rng.integers(1, 4))
            ids = tuple(int(x) for x in rng.integers(0, 5, size=k))
            chs.append(_rand_channel(rng, ids))
        out = simplify_channels(list(chs), null_col_id=0)
        assert_same_f_dist(chs, out, SIG)

    def test_idempotent(self):
        rng = np.random.default_rng(60)
        chs = [_rand_channel(rng, (2, 1)), _rand_channel(rng, (1,))]
        once = simplify_channels(list(chs), null_col_id=0)
        twice = simplify_channels(list(once), null_col_id=0)
        assert len(once) == len(twice)
        for a, b in zip(once, twice):
            assert a.unique_col_ids == b.unique_col_ids
            np.testing.assert_allclose(a.probs, b.probs)


class TestChannelSampler:
    def _sampler(self, probs_list, transform, seed=0):
        return ChannelSampler(
            channel_probs=probs_list,
            error_transform=np.asarray(transform, dtype=np.uint8),
            seed=seed,
        )

    def test_deterministic_for_seed(self):
        t = np.array([[1, 0], [0, 1]])
        a = self._sampler([error_probs(0.3), error_probs(0.2)], t, seed=5).sample(500)
        b = self._sampler([error_probs(0.3), error_probs(0.2)], t, seed=5).sample(500)
        np.testing.assert_array_equal(a, b)

    def test_marginal_rates(self):
        t = np.array([[1, 0], [0, 1]])
        s = self._sampler([error_probs(0.25), error_probs(0.1)], t, seed=1)
        x = s.sample(200_000)
        assert abs(x[:, 0].mean() - 0.25) < 0.005
        assert abs(x[:, 1].mean() - 0.1) < 0.004

    def test_zero_rate_channel_never_fires(self):
        t = np.array([[1]])
        s = self._sampler([error_probs(0.0)], t, seed=2)
        assert s.sample(1000).sum() == 0

    def test_duplicate_columns_fold(self):
        # two e-bits with identical transform columns XOR into one f.
        t = np.array([[1, 1]])
        s = self._sampler([error_probs(0.5), error_probs(0.5)], t, seed=3)
        x = s.sample(100_000)
        # XOR of two fair coins is fair.
        assert abs(x.mean() - 0.5) < 0.01

    def test_correlated_chain_statistics(self):
        t = np.eye(2, dtype=np.uint8)
        s = self._sampler([correlated_error_probs([0.3, 0.5])], t, seed=4)
        x = s.sample(200_000)
        assert abs(x[:, 0].mean() - 0.3) < 0.005
        assert abs(x[:, 1].mean() - 0.7 * 0.5) < 0.005
        # mutually exclusive: never both
        assert (x.sum(axis=1) > 1).sum() == 0

    def test_empty_transform(self):
        s = self._sampler([], np.zeros((0, 0)), seed=6)
        assert s.sample(10).shape == (10, 0)

    def test_herald_bit_statistics(self):
        t = np.eye(3, dtype=np.uint8)
        s = self._sampler(
            [heralded_pauli_channel_1_probs(0.05, 0.1, 0.0, 0.05)], t, seed=7
        )
        x = s.sample(200_000)
        # herald fires for every heralded outcome
        assert abs(x[:, 0].mean() - 0.2) < 0.005
        # X component: px + py
        assert abs(x[:, 2].mean() - 0.1) < 0.004
        # herald always set when Z or X fire
        assert np.all(x[x[:, 1] == 1, 0] == 1)
        assert np.all(x[x[:, 2] == 1, 0] == 1)
