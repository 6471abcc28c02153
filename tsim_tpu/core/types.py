"""Compilation-stage data types (prepared graph, compiled pytrees)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import TYPE_CHECKING

import numpy as np
from jax import Array

from ..utils.pytree import pytree_dataclass, static_field

if TYPE_CHECKING:
    from ..compile.compile import CompiledScalarGraphs
    from ..zx.graph import ZXGraph


@dataclass(frozen=True)
class SamplingGraph:
    """Prepared (doubled, reduced, error-transformed) sampling graph.

    ``error_transform`` has shape (num_f, num_e): f = T @ e mod 2.
    """

    graph: "ZXGraph"
    error_transform: np.ndarray
    channel_probs: list[np.ndarray]
    num_outputs: int
    num_detectors: int


@pytree_dataclass
class CompiledComponent:
    """One compiled connected component.

    ``compiled_scalar_graphs`` is the plugged-circuit ladder:
    sequential mode -> [norm, 1 plugged, ..., n plugged];
    joint mode -> [norm, all plugged].
    """

    output_indices: tuple = static_field()
    f_selection: tuple = static_field(default=())
    compiled_scalar_graphs: tuple = None


@dataclass(frozen=True)
class CompiledProgram:
    """Fully compiled program ready for sampling."""

    components: tuple
    direct_f_indices: Array
    direct_flips: Array
    output_order: Array
    output_reindex: Array | None
    num_outputs: int
    num_detectors: int
    # True where the direct output is a constant (deterministic detector):
    # the f column is a dummy index 0 and the value is just the flip bit.
    direct_const_mask: Array | None = None
