"""Batched exact arithmetic in Z[w] * 2^power on device, w = e^{i pi/4}.

Values are ``(c0 + c1 w + c2 i + c3 w^3) * 2^power`` with int32 coefficient
vectors of shape (..., 4) and an int32 power array. Products and sums stay
exact until a single float conversion at the end (the numerical heart of the
sampler; reference ``tsim/core/exact_scalar.py`` has the same contract).

The reduction keeps coefficients small by dividing out common factors of 2
into ``power`` — one reduction step per combine, plus a while-loop fixpoint
after each scan (a sequential scan can lag canonical form by log2(N) steps).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array, lax

from ..utils.pytree import pytree_dataclass

_E4 = jnp.exp(1j * jnp.pi / 4)

_SCAN_UNROLL = 16


def _mul_coeffs(d1: Array, d2: Array) -> Array:
    """Multiply coefficient vectors in Z[w] (w^4 = -1)."""
    a1, b1, c1, e1 = d1[..., 0], d1[..., 1], d1[..., 2], d1[..., 3]
    a2, b2, c2, e2 = d2[..., 0], d2[..., 1], d2[..., 2], d2[..., 3]
    A = a1 * a2 - b1 * e2 - c1 * c2 - e1 * b2
    B = a1 * b2 + b1 * a2 - c1 * e2 - e1 * c2
    C = a1 * c2 + b1 * b2 + c1 * a2 - e1 * e2
    D = a1 * e2 + b1 * c2 + c1 * b2 + e1 * a2
    return jnp.stack([A, B, C, D], axis=-1).astype(d1.dtype)


def _reduce_step(power: Array, coeffs: Array) -> tuple[Array, Array]:
    reducible = jnp.all(coeffs % 2 == 0, axis=-1) & jnp.any(coeffs != 0, axis=-1)
    coeffs = jnp.where(reducible[..., None], coeffs // 2, coeffs)
    power = jnp.where(reducible, power + 1, power)
    return power, coeffs


def _mul_with_power(x, y):
    p1, c1 = x
    p2, c2 = y
    return _reduce_step(p1 + p2, _mul_coeffs(c1, c2))


def _add_with_power(x, y):
    p1, c1 = x
    p2, c2 = y
    s1 = jnp.left_shift(jnp.ones_like(p1), jnp.maximum(p1 - p2, 0))[..., None]
    s2 = jnp.left_shift(jnp.ones_like(p2), jnp.maximum(p2 - p1, 0))[..., None]
    return _reduce_step(jnp.minimum(p1, p2), c1 * s1 + c2 * s2)


def _reduce_along_scan(power, coeffs, op, axis):
    """Sequential scan reduction keeping an O(1) carry, then a fixpoint."""
    if axis < 0:
        axis += power.ndim
    power_t = jnp.moveaxis(power, axis, 0)
    coeffs_t = jnp.moveaxis(coeffs, axis, 0)
    init = (power_t[0], coeffs_t[0])
    rest = (power_t[1:], coeffs_t[1:])

    def step(carry, x):
        return op(carry, x), None

    (fp, fc), _ = lax.scan(step, init, rest, unroll=_SCAN_UNROLL)

    def cond(state):
        return state[2]

    def body(state):
        p, c, _ = state
        np_, nc = _reduce_step(p, c)
        return np_, nc, jnp.any(np_ != p)

    fp, fc, _ = lax.while_loop(cond, body, (fp, fc, jnp.bool_(True)))
    return fp, fc


@pytree_dataclass
class ExactScalarArray:
    """Array of exact Z[w]-ring scalars with power-of-2 exponents."""

    coeffs: Array
    power: Array

    @staticmethod
    def from_coeffs(coeffs: Array, power: Array | None = None) -> "ExactScalarArray":
        if power is None:
            power = jnp.zeros(coeffs.shape[:-1], dtype=jnp.int32)
        return ExactScalarArray(coeffs=coeffs, power=power)

    def __mul__(self, other: "ExactScalarArray") -> "ExactScalarArray":
        return ExactScalarArray(
            coeffs=_mul_coeffs(self.coeffs, other.coeffs),
            power=self.power + other.power,
        )

    def sum(self, axis: int = -1) -> "ExactScalarArray":
        if axis < 0:
            axis += self.power.ndim
        p, c = _reduce_along_scan(self.power, self.coeffs, _add_with_power, axis)
        return ExactScalarArray(coeffs=c, power=p)

    def prod(self, axis: int = -1) -> "ExactScalarArray":
        if axis < 0:
            axis += self.power.ndim
        if self.coeffs.shape[axis] == 0:
            shape = self.coeffs.shape[:axis] + self.coeffs.shape[axis + 1 :]
            c = jnp.zeros(shape, dtype=self.coeffs.dtype).at[..., 0].set(1)
            return ExactScalarArray.from_coeffs(c)
        p, c = _reduce_along_scan(self.power, self.coeffs, _mul_with_power, axis)
        return ExactScalarArray(coeffs=c, power=p)

    def to_complex(self) -> Array:
        c = self.coeffs
        val = c[..., 0] + c[..., 1] * _E4 + c[..., 2] * 1j + c[..., 3] * _E4 * 1j
        return val * jnp.pow(2.0, self.power)
