"""Exact Z[w] arithmetic and term-family evaluation vs complex references."""

import itertools

import jax.numpy as jnp
import numpy as np
import pytest

from tsim_tpu.core.exact_scalar import ExactScalarArray
from tsim_tpu.compile.terms import (
    HalfPiPhases,
    NodePhases,
    PhasePairs,
    PiProducts,
    omega_coeffs,
    one_plus_omega_coeffs,
)

W = np.exp(1j * np.pi / 4)


def _to_complex(esa: ExactScalarArray) -> np.ndarray:
    return np.asarray(esa.to_complex())


class TestExactScalar:
    def test_omega_coeffs_table(self):
        for k in range(8):
            c = np.asarray(omega_coeffs(jnp.array([k])))[:, 0]
            val = c[0] + c[1] * W + c[2] * 1j + c[3] * W * 1j
            np.testing.assert_allclose(val, W**k, atol=1e-12)
            c2 = np.asarray(one_plus_omega_coeffs(jnp.array([k])))[:, 0]
            val2 = c2[0] + c2[1] * W + c2[2] * 1j + c2[3] * W * 1j
            np.testing.assert_allclose(val2, 1 + W**k, atol=1e-12)

    def test_mul_sum_prod_vs_complex(self):
        rng = np.random.default_rng(0)
        coeffs = rng.integers(-3, 4, size=(4, 5, 7)).astype(np.int32)
        power = rng.integers(-2, 3, size=(5, 7)).astype(np.int32)
        esa = ExactScalarArray(coeffs=jnp.array(coeffs), power=jnp.array(power))
        ref = (
            coeffs[0] + coeffs[1] * W + coeffs[2] * 1j + coeffs[3] * W * 1j
        ) * 2.0 ** power
        np.testing.assert_allclose(_to_complex(esa), ref, atol=1e-6)

        prod = esa.prod(axis=-1)
        np.testing.assert_allclose(
            _to_complex(prod), ref.prod(axis=-1), rtol=1e-5
        )
        ssum = esa.sum(axis=-1)
        np.testing.assert_allclose(_to_complex(ssum), ref.sum(axis=-1), rtol=1e-5)
        both = esa * esa
        np.testing.assert_allclose(_to_complex(both), ref * ref, rtol=1e-5)

    def test_long_sum_canonicalization(self):
        # 40 copies of sqrt(2)-ish values: powers must stay canonical.
        coeffs = np.tile(np.array([0, 1, 0, -1], np.int32)[:, None, None], (1, 1, 40))
        esa = ExactScalarArray.from_coeffs(jnp.array(coeffs))
        out = esa.sum(axis=-1)
        np.testing.assert_allclose(_to_complex(out)[0], 40 * np.sqrt(2), rtol=1e-6)

    def test_abs_matches_complex(self):
        rng = np.random.default_rng(1)
        coeffs = rng.integers(-3, 4, size=(4, 9)).astype(np.int32)
        esa = ExactScalarArray.from_coeffs(jnp.array(coeffs))
        np.testing.assert_allclose(
            np.asarray(esa.abs()), np.abs(_to_complex(esa)), rtol=1e-5
        )


def brute_parity(params, vals):
    return np.asarray(params, int) @ np.asarray(vals, int) % 2


class TestFamilies:
    def test_node_phases(self):
        # (T=2, G=3) with counts masking
        phases = np.array([[1, 3, 0], [2, 0, 0]], np.uint8)  # (T, G)
        params = np.array(
            [[[1, 0], [0, 1], [0, 0]], [[1, 1], [0, 0], [0, 0]]], np.uint8
        )
        counts = np.array([2, 1, 0], np.int32)
        fam = NodePhases(
            phases=jnp.array(phases), params=jnp.array(params),
            counts=jnp.array(counts),
        )
        for bits in itertools.product([0, 1], repeat=2):
            out = _to_complex(fam.evaluate(jnp.array([bits], jnp.uint8)))[0]
            want = np.ones(3, complex)
            for g in range(3):
                for t in range(counts[g]):
                    par = brute_parity(params[t, g], bits)
                    want[g] *= 1 + W ** ((phases[t, g] + 4 * par) % 8)
            np.testing.assert_allclose(out, want, atol=1e-6)

    def test_halfpi(self):
        coeffs = np.array([[2, 6], [4, 0]], np.uint8)
        params = np.array([[[1, 0], [0, 1]], [[1, 1], [0, 0]]], np.uint8)
        fam = HalfPiPhases(coeffs=jnp.array(coeffs), params=jnp.array(params))
        for bits in itertools.product([0, 1], repeat=2):
            out = _to_complex(fam.evaluate(jnp.array([bits], jnp.uint8)))[0]
            want = np.ones(2, complex)
            for g in range(2):
                tot = 0
                for t in range(2):
                    tot += int(coeffs[t, g]) * brute_parity(params[t, g], bits)
                want[g] = W ** (tot % 8)
            np.testing.assert_allclose(out, want, atol=1e-6)

    def test_pi_products(self):
        psi_c = np.array([[1], [0]], np.uint8)
        psi_p = np.array([[[1, 0]], [[0, 1]]], np.uint8)
        phi_c = np.array([[0], [1]], np.uint8)
        phi_p = np.array([[[0, 1]], [[1, 1]]], np.uint8)
        fam = PiProducts(
            psi_const=jnp.array(psi_c), psi_params=jnp.array(psi_p),
            phi_const=jnp.array(phi_c), phi_params=jnp.array(phi_p),
        )
        for bits in itertools.product([0, 1], repeat=2):
            out = _to_complex(fam.evaluate(jnp.array([bits], jnp.uint8)))[0]
            want = 1.0
            for t in range(2):
                psi = (psi_c[t, 0] + brute_parity(psi_p[t, 0], bits)) % 2
                phi = (phi_c[t, 0] + brute_parity(phi_p[t, 0], bits)) % 2
                want *= (-1.0) ** (psi * phi)
            np.testing.assert_allclose(out[0], want, atol=1e-6)

    def test_phase_pairs(self):
        alpha = np.array([[2], [5]], np.uint8)
        beta = np.array([[1], [0]], np.uint8)
        ap = np.array([[[1, 0]], [[0, 0]]], np.uint8)
        bp = np.array([[[0, 1]], [[1, 1]]], np.uint8)
        counts = np.array([2], np.int32)
        fam = PhasePairs(
            alpha=jnp.array(alpha), alpha_params=jnp.array(ap),
            beta=jnp.array(beta), beta_params=jnp.array(bp),
            counts=jnp.array(counts),
        )
        for bits in itertools.product([0, 1], repeat=2):
            out = _to_complex(fam.evaluate(jnp.array([bits], jnp.uint8)))[0]
            want = 1.0 + 0j
            for t in range(2):
                a = (alpha[t, 0] + 4 * brute_parity(ap[t, 0], bits)) % 8
                b = (beta[t, 0] + 4 * brute_parity(bp[t, 0], bits)) % 8
                want *= 1 + W**a + W**b - W ** ((a + b) % 8)
            np.testing.assert_allclose(out[0], want, atol=1e-6)


def test_tree_reductions_match_bruteforce():
    """Tree prod/sum must equal term-by-term exact reduction (any N)."""
    import numpy as np
    from tsim_tpu.core.exact_scalar import ExactScalarArray

    rng = np.random.default_rng(3)
    w = np.exp(1j * np.pi / 4)
    for n in [1, 2, 3, 7, 16, 33]:
        # Realistic product leaves: 1 + w^k terms (|v| <= 2, like the
        # compiled term families), so exact products fit int32 even at n=33.
        ks = rng.integers(0, 8, size=(n, 5))
        coeffs = np.zeros((4, n, 5), np.int32)
        coeffs[0] = 1
        sign = np.where(ks >= 4, -1, 1)
        for j in range(4):
            np.add.at(coeffs, (j,), np.where(ks % 4 == j, sign, 0))
        power = rng.integers(-3, 4, size=(n, 5)).astype(np.int32)
        esa = ExactScalarArray(coeffs=jnp.asarray(coeffs), power=jnp.asarray(power))
        vals = (
            coeffs[0] + coeffs[1] * w + coeffs[2] * 1j + coeffs[3] * w**3
        ) * np.exp2(power)
        got = esa.prod(axis=0)
        re, im = got.to_real_imag()
        np.testing.assert_allclose(
            np.asarray(re) + 1j * np.asarray(im), vals.prod(axis=0),
            rtol=1e-5, atol=1e-6,
        )
        # Sums: arbitrary small coefficients are safe (growth is linear).
        coeffs = rng.integers(-2, 3, size=(4, n, 5)).astype(np.int32)
        esa = ExactScalarArray(coeffs=jnp.asarray(coeffs), power=jnp.asarray(power))
        vals = (
            coeffs[0] + coeffs[1] * w + coeffs[2] * 1j + coeffs[3] * w**3
        ) * np.exp2(power)
        re, im = esa.sum(axis=0).to_real_imag()
        np.testing.assert_allclose(
            np.asarray(re) + 1j * np.asarray(im), vals.sum(axis=0),
            rtol=1e-5, atol=1e-6,
        )
