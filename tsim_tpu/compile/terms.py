"""Term-family pytrees for compiled scalar graphs.

Each compiled ZX scalar is a product of four families plus a static
prefactor; each family evaluates a batch of binary parameter vectors into an
:class:`ExactScalarArray` (semantics match reference ``tsim/compile/terms.py``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from ..core.exact_scalar import ExactScalarArray
from ..ops.gf2 import matmul_gf2
from ..utils.pytree import pytree_dataclass, static_field

# UNIT_PHASES[k] = exact coefficients of w^k in the (1, w, i, w^3) basis.
UNIT_PHASES = jnp.array(
    [
        [1, 0, 0, 0],
        [0, 1, 0, 0],
        [0, 0, 1, 0],
        [0, 0, 0, 1],
        [-1, 0, 0, 0],
        [0, -1, 0, 0],
        [0, 0, -1, 0],
        [0, 0, 0, -1],
    ],
    dtype=jnp.int32,
)

_ONE_PLUS_PHASES = UNIT_PHASES.at[:, 0].add(1)
_IDENTITY = jnp.array([1, 0, 0, 0], dtype=jnp.int32)


@pytree_dataclass
class NodePhases:
    """Product of ``1 + exp(i (alpha + pi * parity) )`` terms.

    ``phases`` stores alpha in eighth-turns (0-7); padded slots are masked to
    the multiplicative identity via ``counts``.
    Shapes: phases (G, T); params (G, T, P); counts (G,).
    """

    phases: Array
    params: Array
    counts: Array

    def evaluate(self, param_vals: Array) -> ExactScalarArray:
        rowsum = matmul_gf2(self.params, param_vals)
        phase_idx = (4 * rowsum + self.phases) % 8
        term_vals = _ONE_PLUS_PHASES[phase_idx]
        mask = jnp.arange(self.phases.shape[1])[None, :] < self.counts[:, None]
        term_vals = jnp.where(mask[..., None], term_vals, _IDENTITY)
        return ExactScalarArray.from_coeffs(term_vals).prod(axis=-1)


@pytree_dataclass
class HalfPiPhases:
    """Sum of ``exp(i j pi/2 parity)`` exponents; coeffs in eighth-turns."""

    coeffs: Array  # (G, T) values in {0, 2, 4, 6}; 0 = padding
    params: Array  # (G, T, P)

    def evaluate(self, param_vals: Array) -> ExactScalarArray:
        rowsum = matmul_gf2(self.params, param_vals)
        phase_idx = (rowsum * self.coeffs) % 8
        total = jnp.sum(phase_idx, axis=-1) % 8
        return ExactScalarArray.from_coeffs(UNIT_PHASES[total])


@pytree_dataclass
class PiProducts:
    """Product of ``(-1)^(psi * phi)`` terms, each side const xor parity."""

    psi_const: Array  # (G, T)
    psi_params: Array  # (G, T, P)
    phi_const: Array  # (G, T)
    phi_params: Array  # (G, T, P)

    def evaluate(self, param_vals: Array) -> ExactScalarArray:
        psi = (self.psi_const + matmul_gf2(self.psi_params, param_vals)) % 2
        phi = (self.phi_const + matmul_gf2(self.phi_params, param_vals)) % 2
        exponent = jnp.sum((psi * phi) % 2, axis=-1) % 2
        coeffs = (1 - 2 * exponent).astype(jnp.int32)[..., None] * _IDENTITY
        return ExactScalarArray.from_coeffs(coeffs)


@pytree_dataclass
class PhasePairs:
    """Product of ``1 + e^{ia} + e^{ib} - e^{i(a+b)}`` terms."""

    alpha: Array  # (G, T) eighth-turns
    alpha_params: Array  # (G, T, P)
    beta: Array  # (G, T) eighth-turns
    beta_params: Array  # (G, T, P)
    counts: Array  # (G,)

    def evaluate(self, param_vals: Array) -> ExactScalarArray:
        ra = matmul_gf2(self.alpha_params, param_vals)
        rb = matmul_gf2(self.beta_params, param_vals)
        a = (self.alpha + 4 * ra) % 8
        b = (self.beta + 4 * rb) % 8
        g = (a + b) % 8
        term_vals = _IDENTITY + UNIT_PHASES[a] + UNIT_PHASES[b] - UNIT_PHASES[g]
        mask = jnp.arange(self.alpha.shape[1])[None, :] < self.counts[:, None]
        term_vals = jnp.where(mask[..., None], term_vals, _IDENTITY)
        return ExactScalarArray.from_coeffs(term_vals).prod(axis=-1)


@pytree_dataclass
class ScalarPrefactor:
    """Per-graph static scalar: ``w^phase * dyadic * 2^power2`` plus an
    optional approximate complex factor for non-dyadic phases."""

    phase_indices: Array  # (G,) uint8 0-7
    floatfactor: Array  # (G, 4) int32 exact Z[w] element
    power2: Array  # (G,) int32
    approximate_floatfactors: Array  # (G, 2) float32 (re, im) pairs
    has_approximate_floatfactors: bool = static_field(default=False)
