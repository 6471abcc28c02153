"""Evaluation of compiled scalar graphs: the sampling hot kernel.

``evaluate(circuit, param_vals)`` -> complex amplitudes (batch,). Exact
Z[w] arithmetic throughout with a single float conversion at the end
(mirrors reference ``tsim/compile/evaluate.py``). XLA fuses the parity
GEMMs with the term-table lookups and the scan-based exact reductions.
"""

from __future__ import annotations

import functools
import operator

import jax
import jax.numpy as jnp
from jax import Array

from ..core.exact_scalar import ExactScalarArray
from .compile import CompiledScalarGraphs
from .terms import UNIT_PHASES


@jax.jit
def evaluate(circuit: CompiledScalarGraphs, param_vals: Array) -> Array:
    """Evaluate amplitudes for batched binary parameter values (B, P)."""
    prefactor = circuit.prefactor
    if prefactor.phase_indices.shape[0] == 0:
        return jnp.zeros(param_vals.shape[0], dtype=jnp.complex64)

    static_phases = ExactScalarArray.from_coeffs(UNIT_PHASES[prefactor.phase_indices])
    float_factor = ExactScalarArray.from_coeffs(prefactor.floatfactor)

    total = functools.reduce(
        operator.mul,
        [
            circuit.node_phases.evaluate(param_vals),
            circuit.halfpi_phases.evaluate(param_vals),
            circuit.pi_products.evaluate(param_vals),
            circuit.phase_pairs.evaluate(param_vals),
            static_phases,
            float_factor,
        ],
    )

    if not prefactor.has_approximate_floatfactors:
        total = ExactScalarArray(coeffs=total.coeffs, power=total.power + prefactor.power2)
        return total.sum().to_complex()

    return jnp.sum(
        total.to_complex()
        * prefactor.approximate_floatfactors
        * 2.0 ** prefactor.power2,
        axis=-1,
    )
