"""Fused Pallas TPU kernel for compiled-scalar-graph evaluation.

The XLA path in ``evaluate.py`` materializes (4, B, T, G) int32 term arrays
in HBM between every step of the exact product — the sampler's dominant
memory traffic. This kernel keeps everything for one (batch-tile,
graph-tile) in VMEM: parity matmuls on the MXU, term-coefficient
construction, the exact Z[w] ring product over all four term families, the
static prefactor, and the exact sum across the graph tile. Only the tiny
per-tile partial sums (B, G/Gt, 4+1 ints) ever return to HBM.

Semantics are bit-identical to ``evaluate.evaluate_abs`` (verified by
tests/unit/compile/test_pallas_evaluate.py); the public entry point
``evaluate_abs_auto`` dispatches to the kernel on TPU and to the XLA path
elsewhere.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.experimental import pallas as pl

from ..core.exact_scalar import ExactScalarArray
from .compile import CompiledScalarGraphs
from .evaluate import evaluate_abs as _evaluate_abs_xla
from .evaluate import _anchor, _coeffs_to_real_imag

_BT = 64    # batch tile
_GT_MAX = 1024  # graph tile cap (wider tiles amortize better, ~13% on v5e)


def _tiles() -> tuple[int, int, int]:
    """(batch_tile, graph_tile_cap, graph_granule) for the active backend.

    Mosaic wants (8, 128)-aligned tiles; the interpret path (CPU tests)
    compiles its XLA emulation in time proportional to tile area, so tiny
    tiles there (370s -> 5s per compile on a 1-core host)."""
    if jax.default_backend() == "tpu":
        bt = int(os.environ.get("TSIM_TPU_BT", _BT))
        gt = int(os.environ.get("TSIM_TPU_GT", _GT_MAX))
        return bt, gt, 128
    return 8, 8, 8


def _pad_to(x: np.ndarray | Array, size: int, axis: int, value=0):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    if isinstance(x, np.ndarray):
        return np.pad(x, widths, constant_values=value)
    return jnp.pad(x, widths, constant_values=value)


# --------------------------------------------------------------- in-kernel
# Exact Z[w] arithmetic on 4 separate int32 tiles (c0..c3) plus a power
# tile; mirrors core/exact_scalar.py but register/VMEM-resident.

def _k_reduce_step(c, p):
    # No all-zero guard (unlike core/exact_scalar.py): an exact-zero entry
    # halves to zero with a drifting power, which represents the same value
    # (0 * 2^p) and saves 7 VPU ops per reduce on the hot path.
    red = ((c[0] | c[1] | c[2] | c[3]) & 1) == 0
    c = tuple(jnp.where(red, ci >> 1, ci) for ci in c)
    return c, jnp.where(red, p + 1, p)


def _k_mul(a, b):
    a0, a1, a2, a3 = a
    b0, b1, b2, b3 = b
    return (
        a0 * b0 - a1 * b3 - a2 * b2 - a3 * b1,
        a0 * b1 + a1 * b0 - a2 * b3 - a3 * b2,
        a0 * b2 + a1 * b1 + a2 * b0 - a3 * b3,
        a0 * b3 + a1 * b2 + a2 * b1 + a3 * b0,
    )


def _k_mul_acc(acc, accp, term, termp):
    c = _k_mul(acc, term)
    return _k_reduce_step(c, accp + termp)



def _k_rot(acc, k):
    """w^k * acc via coefficient rotation (selects, no integer multiplies).

    (a0 + a1 w + a2 w^2 + a3 w^3) * w = -a3 + a0 w + a1 w^2 + a2 w^3, so
    w^km is a cyclic shift with a sign on the wrapped coefficients, and the
    k >> 2 bit is a global sign.
    """
    # Staged binary rotation: conditionally apply w^1, then w^2, then w^4
    # on the bits of k — 12 selects instead of 16 for the nested-select
    # form (the rotation chain is the kernel's hottest primitive).
    a0, a1, a2, a3 = acc
    b0 = (k & 1) == 1
    a0, a1, a2, a3 = (
        jnp.where(b0, -a3, a0),
        jnp.where(b0, a0, a1),
        jnp.where(b0, a1, a2),
        jnp.where(b0, a2, a3),
    )
    b1 = (k & 2) == 2
    a0, a1, a2, a3 = (
        jnp.where(b1, -a2, a0),
        jnp.where(b1, -a3, a1),
        jnp.where(b1, a0, a2),
        jnp.where(b1, a1, a3),
    )
    b2 = (k & 4) == 4
    return (
        jnp.where(b2, -a0, a0),
        jnp.where(b2, -a1, a1),
        jnp.where(b2, -a2, a2),
        jnp.where(b2, -a3, a3),
    )


# MXU input dtype for the 0/1 parity matmuls. All three are exact here
# (operands are 0/1 and row sums are <= P <= 42): measured on the 2-check
# cultivation workload (dev/cult2_kernel_probe.py, v5e) f32 = 60.5k
# shots/s, bf16 = 56.2k (the uint8->bf16 cast chain costs more VPU time
# than the MXU saves at K=42). f32 stays the default; the knob remains
# for re-measuring on other tile shapes.
_PARITY_DTYPES = {
    "f32": jnp.float32,
    "bf16": jnp.bfloat16,
    "int8": jnp.int8,
}
_parity_env = os.environ.get("TSIM_TPU_PARITY_DTYPE", "f32")
if _parity_env not in _PARITY_DTYPES:
    import warnings as _warnings

    _warnings.warn(
        f"Invalid TSIM_TPU_PARITY_DTYPE={_parity_env!r} "
        f"(expected one of {sorted(_PARITY_DTYPES)}); falling back to 'f32'.",
        stacklevel=2,
    )
    _parity_env = "f32"
_PARITY_DTYPE = _PARITY_DTYPES[_parity_env]
_PARITY_ACC = jnp.int32 if _PARITY_DTYPE == jnp.int8 else jnp.float32


def _k_parities(params_ref, x_mxu, T, Gt):
    """(Bt, T, Gt) int32 parities of params @ x^T mod 2 via one MXU dot."""
    # uint8 -> int32 -> float: Mosaic lacks a direct uint8->float cast.
    w = (
        params_ref[...].astype(jnp.int32).astype(_PARITY_DTYPE).reshape(T * Gt, -1)
    )
    prod = lax.dot_general(
        x_mxu, w, (((1,), (1,)), ((), ())),
        preferred_element_type=_PARITY_ACC,
    )  # (Bt, T*Gt)
    return prod.astype(jnp.int32).reshape(x_mxu.shape[0], T, Gt) & 1


def _product_body(
    dims,
    x_ref,            # (Bt, P) uint8 param values
    np_phases_ref,    # (T1, Gt) int32
    np_params_ref,    # (T1, Gt, P) uint8
    np_counts_ref,    # (1, Gt) int32
    hp_coeffs_ref,    # (T2, Gt) int32
    hp_params_ref,    # (T2, Gt, P) uint8
    pp_psi_c_ref,     # (T3, Gt) int32
    pp_psi_p_ref,     # (T3, Gt, P) uint8
    pp_phi_c_ref,     # (T3, Gt) int32
    pp_phi_p_ref,     # (T3, Gt, P) uint8
    qp_alpha_ref,     # (T4, Gt) int32
    qp_alpha_p_ref,   # (T4, Gt, P) uint8
    qp_beta_ref,      # (T4, Gt) int32
    qp_beta_p_ref,    # (T4, Gt, P) uint8
    qp_counts_ref,    # (1, Gt) int32
    pf_phase_ref,     # (1, Gt) int32
    pf_ff_ref,        # (4, Gt) int32
    pf_pow_ref,       # (1, Gt) int32
):
    T1, T2, T3, T4, Gt = dims
    x = x_ref[...].astype(jnp.int32).astype(_PARITY_DTYPE)
    Bt = x.shape[0]

    acc = (
        jnp.ones((Bt, Gt), jnp.int32),
        jnp.zeros((Bt, Gt), jnp.int32),
        jnp.zeros((Bt, Gt), jnp.int32),
        jnp.zeros((Bt, Gt), jnp.int32),
    )
    accp = jnp.zeros((Bt, Gt), jnp.int32)

    # ---- node phases: prod of (1 + w^(phases + 4*parity)), masked by count
    if T1:
        par = _k_parities(np_params_ref, x, T1, Gt)
        counts = np_counts_ref[0][None, :]  # (1, Gt)
        phases = np_phases_ref[...]
        for t in range(T1):
            idx = (phases[t][None, :] + 4 * par[:, t, :]) & 7
            # acc * (1 + w^idx) = acc + rot_idx(acc): selects + adds only.
            rot = _k_rot(acc, idx)
            live = (t < counts)
            acc = tuple(
                jnp.where(live, ai + ri, ai) for ai, ri in zip(acc, rot)
            )
            acc, accp = _k_reduce_step(acc, accp)

    # ---- half-pi phases: single w^(sum of coeffs*parity mod 8) factor
    if T2:
        par = _k_parities(hp_params_ref, x, T2, Gt)
        coeffs = hp_coeffs_ref[...]
        total = jnp.zeros((Bt, Gt), jnp.int32)
        for t in range(T2):
            total = total + coeffs[t][None, :] * par[:, t, :]
        acc = _k_rot(acc, total & 7)

    # ---- pi products: global sign (-1)^(sum psi*phi)
    if T3:
        par_psi = _k_parities(pp_psi_p_ref, x, T3, Gt)
        par_phi = _k_parities(pp_phi_p_ref, x, T3, Gt)
        psi_c = pp_psi_c_ref[...]
        phi_c = pp_phi_c_ref[...]
        expo = jnp.zeros((Bt, Gt), jnp.int32)
        for t in range(T3):
            psi = (psi_c[t][None, :] + par_psi[:, t, :]) & 1
            phi = (phi_c[t][None, :] + par_phi[:, t, :]) & 1
            expo = expo ^ (psi & phi)
        sign = 1 - 2 * expo
        acc = tuple(ci * sign for ci in acc)

    # ---- phase pairs: prod of (1 + w^a + w^b - w^(a+b)), masked by count
    if T4:
        par_a = _k_parities(qp_alpha_p_ref, x, T4, Gt)
        par_b = _k_parities(qp_beta_p_ref, x, T4, Gt)
        alpha = qp_alpha_ref[...]
        beta = qp_beta_ref[...]
        counts = qp_counts_ref[0][None, :]
        for t in range(T4):
            a = (alpha[t][None, :] + 4 * par_a[:, t, :]) & 7
            b = (beta[t][None, :] + 4 * par_b[:, t, :]) & 7
            g = (a + b) & 7
            # acc * (1 + w^a + w^b - w^(a+b)): three rotations of acc.
            ra, rb, rg = _k_rot(acc, a), _k_rot(acc, b), _k_rot(acc, g)
            live = (t < counts)
            acc = tuple(
                jnp.where(live, ai + rai + rbi - rgi, ai)
                for ai, rai, rbi, rgi in zip(acc, ra, rb, rg)
            )
            acc, accp = _k_reduce_step(acc, accp)

    # ---- static prefactor: w^phase * floatfactor * 2^power2
    acc = _k_rot(acc, pf_phase_ref[0][None, :] & 7)
    ff = tuple(pf_ff_ref[j][None, :] * jnp.ones((Bt, 1), jnp.int32) for j in range(4))
    acc, accp = _k_mul_acc(acc, accp, ff, 0)
    accp = accp + pf_pow_ref[0][None, :]
    return acc, accp


def _zero_power(acc, accp):
    # Exactly-zero entries carry a drifted power (the reduce step has no
    # all-zero guard); pin it to 0 so downstream float32 exp2 cannot
    # overflow to inf and produce 0 * inf = NaN on zero amplitudes.
    zero = (acc[0] | acc[1] | acc[2] | acc[3]) == 0
    return jnp.where(zero, 0, accp)


def _kernel_exact(dims, *refs):
    """Exact finisher: Z[w] tree sum across the graph tile."""
    out_c_ref, out_p_ref = refs[-2:]
    acc, accp = _product_body(dims, *refs[:-2])
    n = dims[-1]
    while n > 1:
        h = n // 2
        a = (tuple(ci[:, :h] for ci in acc), accp[:, :h])
        b = (tuple(ci[:, h : 2 * h] for ci in acc), accp[:, h : 2 * h])
        d1 = jnp.clip(a[1] - b[1], 0, 30)
        d2 = jnp.clip(b[1] - a[1], 0, 30)
        s1 = jnp.left_shift(jnp.ones_like(d1), d1)
        s2 = jnp.left_shift(jnp.ones_like(d2), d2)
        c = tuple(a[0][j] * s1 + b[0][j] * s2 for j in range(4))
        p = jnp.minimum(a[1], b[1])
        c, p = _k_reduce_step(c, p)
        if n % 2:
            c = tuple(
                jnp.concatenate([c[j], acc[j][:, -1:]], axis=1) for j in range(4)
            )
            p = jnp.concatenate([p, accp[:, -1:]], axis=1)
        acc, accp = c, p
        n = (n + 1) // 2 if n % 2 else h

    out_c_ref[...] = jnp.concatenate([acc[j] for j in range(4)], axis=1)[None]
    out_p_ref[...] = _zero_power(acc, accp)[None]


_INV_SQRT2 = 0.7071067811865476


def _kernel_approx(dims, *refs):
    """Approximate finisher: weighted complex float32 sum over the tile.

    Matches evaluate.evaluate_abs's approximate-floatfactor branch: each
    graph's exact product becomes (re, im) * 2^power, is multiplied by the
    per-graph approximate complex factor, and graphs sum in float32.
    """
    approx_ref, out_ref = refs[-2:]
    acc, accp = _product_body(dims, *refs[:-2])
    accp = _zero_power(acc, accp)
    c = tuple(ci.astype(jnp.float32) for ci in acc)
    re = c[0] + (c[1] - c[3]) * _INV_SQRT2
    im = c[2] + (c[1] + c[3]) * _INV_SQRT2
    scale = jnp.exp2(accp.astype(jnp.float32))
    fre = approx_ref[0][None, :] * scale
    fim = approx_ref[1][None, :] * scale
    out_re = jnp.sum(re * fre - im * fim, axis=1)
    out_im = jnp.sum(re * fim + im * fre, axis=1)
    out_ref[...] = jnp.stack([out_re, out_im], axis=1)[None]


def _family_blocks(circuit: CompiledScalarGraphs, G_pad: int, P: int):
    """Pad all family tensors to (T, G_pad[, P]) numpy blocks."""
    np_f = circuit.node_phases
    hp = circuit.halfpi_phases
    pp = circuit.pi_products
    qp = circuit.phase_pairs
    pf = circuit.prefactor

    def prep2(x):
        return _pad_to(np.asarray(x, np.int32), G_pad, 1)

    def prep3(x):
        x = np.asarray(x, np.uint8)
        x = _pad_to(x, G_pad, 1)
        return _pad_to(x, P, 2)

    def prep_counts(x):
        return _pad_to(np.asarray(x, np.int32)[None, :], G_pad, 1)

    blocks = dict(
        np_phases=prep2(np_f.phases),
        np_params=prep3(np_f.params),
        np_counts=prep_counts(np_f.counts),
        hp_coeffs=prep2(hp.coeffs),
        hp_params=prep3(hp.params),
        pp_psi_c=prep2(pp.psi_const),
        pp_psi_p=prep3(pp.psi_params),
        pp_phi_c=prep2(pp.phi_const),
        pp_phi_p=prep3(pp.phi_params),
        qp_alpha=prep2(qp.alpha),
        qp_alpha_p=prep3(qp.alpha_params),
        qp_beta=prep2(qp.beta),
        qp_beta_p=prep3(qp.beta_params),
        qp_counts=prep_counts(qp.counts),
        pf_phase=_pad_to(
            np.asarray(pf.phase_indices, np.int32)[None, :], G_pad, 1
        ),
        # Padded graphs get a zero float-factor: they contribute exact 0.
        pf_ff=_pad_to(np.asarray(pf.floatfactor, np.int32).T, G_pad, 1),
        pf_pow=_pad_to(np.asarray(pf.power2, np.int32)[None, :], G_pad, 1),
        pf_approx=_pad_to(
            np.asarray(pf.approximate_floatfactors, np.float32).T, G_pad, 1
        ),
    )
    return blocks


def _ensure_t(x2, x3, Gp, P):
    """Families with T=0 still need rank-stable refs: pad T to 1."""
    if x2.shape[0] == 0:
        x2 = np.zeros((1,) + x2.shape[1:], x2.dtype)
    if x3.shape[0] == 0:
        x3 = np.zeros((1,) + x3.shape[1:], x3.dtype)
    return x2, x3


def _combine_partials(out_c: Array, out_p: Array) -> Array:
    """Exact sum of per-graph-tile partials: (n_gt, B, 4) + (n_gt, B, 1)."""
    coeffs = jnp.transpose(out_c, (2, 1, 0))  # (4, B, n_gt)
    power = out_p[..., 0].T  # (B, n_gt)
    esa = ExactScalarArray.from_coeffs(coeffs, power).sum(axis=-1)
    re, im = _coeffs_to_real_imag(esa.coeffs)
    return jnp.sqrt(re * re + im * im) * jnp.exp2(esa.power.astype(jnp.float32))


def _live_counts(circuit: CompiledScalarGraphs) -> np.ndarray:
    """Per-graph live term counts (A + B + 2*C + 2*D parity rows)."""
    a = np.asarray(circuit.node_phases.counts, np.int64)
    b = (np.asarray(circuit.halfpi_phases.coeffs) != 0).sum(axis=0)
    c = (
        (np.asarray(circuit.pi_products.psi_const) != 0)
        | (np.asarray(circuit.pi_products.psi_params).sum(axis=2) != 0)
        | (np.asarray(circuit.pi_products.phi_params).sum(axis=2) != 0)
    ).sum(axis=0)
    d = np.asarray(circuit.phase_pairs.counts, np.int64)
    return a + b + 2 * c + 2 * d


def _bucket_boundaries(
    live_sorted: np.ndarray, granule: int, max_buckets: int = 3
) -> list[int]:
    """Split points minimizing sum(bucket_size * bucket_maxT) over sorted
    live counts (greedy over candidate split grid; exact enough for <= 3)."""
    G = len(live_sorted)
    if G <= granule or max_buckets == 1:
        return [G]
    best = ([G], G * int(live_sorted[-1]))
    candidates = sorted(
        {int(q * G) // granule * granule for q in (0.25, 0.5, 0.75)} - {0, G}
    )
    import itertools as it

    for k in (1, 2):
        for splits in it.combinations(candidates, k):
            bounds = list(splits) + [G]
            lo = 0
            cost = 0
            for hi in bounds:
                if hi <= lo:
                    cost = None
                    break
                cost += (hi - lo) * int(live_sorted[hi - 1])
                lo = hi
            if cost is not None and cost < best[1]:
                best = (bounds, cost)
    return best[0]


def _slice_family(arr: np.ndarray, idx: np.ndarray, t_max: int) -> np.ndarray:
    """Select graph columns and trim the term axis to ``t_max`` rows."""
    out = arr[: max(t_max, 0)][:, idx] if arr.ndim >= 2 else arr[idx]
    return np.ascontiguousarray(out)



def _family_in_specs(spec2, spec3, spec_c, x_spec):
    """The 18-entry input spec list shared by both kernel layouts."""
    return [
        x_spec,
        spec2(1), spec3(1), spec_c,
        spec2(2), spec3(2),
        spec2(3), spec3(3), spec2(3), spec3(3),
        spec2(4), spec3(4), spec2(4), spec3(4), spec_c,
        spec_c, spec2("ff"), spec_c,
    ]


def _family_inputs(x, blocks):
    """The 18-entry input list shared by both kernel layouts."""
    return [
        x,
        blocks["np_phases"], blocks["np_params"], blocks["np_counts"],
        blocks["hp_coeffs"], blocks["hp_params"],
        blocks["pp_psi_c"], blocks["pp_psi_p"],
        blocks["pp_phi_c"], blocks["pp_phi_p"],
        blocks["qp_alpha"], blocks["qp_alpha_p"],
        blocks["qp_beta"], blocks["qp_beta_p"], blocks["qp_counts"],
        blocks["pf_phase"], blocks["pf_ff"], blocks["pf_pow"],
    ]


def _run_fused_bucket(blocks: dict, dims, x: Array, Bp: int, P: int, approx: bool):
    T1, T2, T3, T4, _GT, Gp, bt = dims
    n_bt, n_gt = Bp // bt, Gp // _GT
    kdims = (T1, T2, T3, T4, _GT)

    T_of = {1: T1, 2: T2, 3: T3, 4: T4, "ff": 4}

    def spec2(f):
        t = T_of[f] if f != "ff" else 4
        return pl.BlockSpec((max(t, 1), _GT), lambda i, j: (0, j))

    def spec3(f):
        return pl.BlockSpec((max(T_of[f], 1), _GT, P), lambda i, j: (0, j, 0))

    spec_c = pl.BlockSpec((1, _GT), lambda i, j: (0, j))
    grid = (n_bt, n_gt)
    in_specs = _family_in_specs(
        spec2, spec3, spec_c, pl.BlockSpec((bt, P), lambda i, j: (i, 0))
    )
    inputs = _family_inputs(x, blocks)
    interpret = jax.default_backend() != "tpu"
    # Output blocks lead with the graph-tile axis: Mosaic requires the last
    # two block dims to divide (8, 128) or equal the array dims.
    if approx:
        out = pl.pallas_call(
            functools.partial(_kernel_approx, kdims),
            grid=grid,
            in_specs=in_specs + [pl.BlockSpec((2, _GT), lambda i, j: (0, j))],
            out_specs=pl.BlockSpec((1, bt, 2), lambda i, j: (j, i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_gt, Bp, 2), jnp.float32),
            interpret=interpret,
        )(*inputs, blocks["pf_approx"])
        return jnp.sum(out, axis=0)  # (Bp, 2) partial complex sum
    return pl.pallas_call(
        functools.partial(_kernel_exact, kdims),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, bt, 4), lambda i, j: (j, i, 0)),
            pl.BlockSpec((1, bt, 1), lambda i, j: (j, i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_gt, Bp, 4), jnp.int32),
            jax.ShapeDtypeStruct((n_gt, Bp, 1), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)


def evaluate_abs_fused(circuit: CompiledScalarGraphs, param_vals: Array) -> Array:
    """|amplitude| per batch row via the fused Pallas kernel.

    Graphs are bucketed by live term count (sorted, split to minimize
    size*maxT) so lightly-termed graphs don't pay the heaviest graph's
    padded term loop; each bucket trims its family tensors to the bucket
    max and launches its own kernel, and bucket partial sums combine
    exactly (Z[w]) or in complex float32 (approximate path).
    """
    B, P_in = param_vals.shape
    bt, gt_max, granule = _tiles()
    Bp = max(bt, ((B + bt - 1) // bt) * bt)
    P = max(P_in, 8)
    x = _pad_to(_pad_to(param_vals.astype(jnp.uint8), P, 1), Bp, 0)
    approx = bool(circuit.prefactor.has_approximate_floatfactors)

    partials_exact: list[tuple[Array, Array]] = []
    partial_approx = None
    for blocks, dims in _prepared_buckets(circuit, P):
        out = _run_fused_bucket(blocks, dims, x, Bp, P, approx)
        if approx:
            partial_approx = out if partial_approx is None else partial_approx + out
        else:
            partials_exact.append(out)

    if approx:
        assert partial_approx is not None
        result = jnp.sqrt(partial_approx[:, 0] ** 2 + partial_approx[:, 1] ** 2)
        return result[:B]
    out_c = jnp.concatenate([p[0] for p in partials_exact], axis=0)
    out_p = jnp.concatenate([p[1] for p in partials_exact], axis=0)
    result = _combine_partials(out_c, out_p)
    return result[:B]


# Prepared bucket blocks are cached as concrete numpy per (circuit, P).
# Inside a trace they lower as jaxpr constants, which the sampler's
# _hoisted_jit turns into runtime parameters (device transfer once, tiny
# HLO); when called eagerly they are device_put once into a second cache.
# The cache must never hold trace-dependent values: a device_put issued
# under tracing returns a tracer, and caching it leaks it into later
# traces (observed as UnexpectedTracerError on re-trace).
_BLOCK_CACHE: dict = {}
_DEVICE_BLOCK_CACHE: dict = {}


def _tracing() -> bool:
    try:
        return not jax.core.trace_state_clean()
    except AttributeError:  # older jax
        return isinstance(jnp.zeros(()) + 0, jax.core.Tracer)


def _prepared_buckets(circuit: CompiledScalarGraphs, P: int):
    buckets = _prepared_buckets_np(circuit, P)
    if _tracing():
        return buckets
    cache_key = (id(circuit), P, jax.default_backend())
    entry = _DEVICE_BLOCK_CACHE.get(cache_key)
    if entry is not None and entry[0] is circuit:
        return entry[1]
    dev = [
        ({k: jax.device_put(v) for k, v in blocks.items()}, dims)
        for blocks, dims in buckets
    ]
    _DEVICE_BLOCK_CACHE[cache_key] = (circuit, dev)
    return dev


def _prepared_buckets_np(circuit: CompiledScalarGraphs, P: int):
    cache_key = (id(circuit), P, jax.default_backend())
    entry = _BLOCK_CACHE.get(cache_key)
    if entry is not None and entry[0] is circuit:
        return entry[1]
    bt, gt_max, granule = _tiles()

    live = _live_counts(circuit)
    order = np.argsort(live, kind="stable")
    bounds = _bucket_boundaries(live[order], granule)

    # Full (unpadded) numpy family arrays, graph axis trailing.
    fam = dict(
        np_phases=np.asarray(circuit.node_phases.phases, np.int32),
        np_params=np.asarray(circuit.node_phases.params, np.uint8),
        np_counts=np.asarray(circuit.node_phases.counts, np.int32)[None, :],
        hp_coeffs=np.asarray(circuit.halfpi_phases.coeffs, np.int32),
        hp_params=np.asarray(circuit.halfpi_phases.params, np.uint8),
        pp_psi_c=np.asarray(circuit.pi_products.psi_const, np.int32),
        pp_psi_p=np.asarray(circuit.pi_products.psi_params, np.uint8),
        pp_phi_c=np.asarray(circuit.pi_products.phi_const, np.int32),
        pp_phi_p=np.asarray(circuit.pi_products.phi_params, np.uint8),
        qp_alpha=np.asarray(circuit.phase_pairs.alpha, np.int32),
        qp_alpha_p=np.asarray(circuit.phase_pairs.alpha_params, np.uint8),
        qp_beta=np.asarray(circuit.phase_pairs.beta, np.int32),
        qp_beta_p=np.asarray(circuit.phase_pairs.beta_params, np.uint8),
        qp_counts=np.asarray(circuit.phase_pairs.counts, np.int32)[None, :],
        pf_phase=np.asarray(circuit.prefactor.phase_indices, np.int32)[None, :],
        pf_ff=np.asarray(circuit.prefactor.floatfactor, np.int32).T,
        pf_pow=np.asarray(circuit.prefactor.power2, np.int32)[None, :],
        pf_approx=np.asarray(
            circuit.prefactor.approximate_floatfactors, np.float32
        ).T,
    )

    buckets = []
    lo = 0
    for hi in bounds:
        idx = order[lo:hi]
        lo = hi
        if len(idx) == 0:
            continue
        # Per-bucket trimmed term maxima.
        a_max = int(fam["np_counts"][0, idx].max(initial=0))
        b_max = int((fam["hp_coeffs"][:, idx] != 0).sum(axis=0).max(initial=0))
        c_live = (
            (fam["pp_psi_c"][:, idx] != 0)
            | (fam["pp_psi_p"][:, idx].sum(axis=2) != 0)
            | (fam["pp_phi_p"][:, idx].sum(axis=2) != 0)
        ).sum(axis=0)
        c_max = int(c_live.max(initial=0))
        d_max = int(fam["qp_counts"][0, idx].max(initial=0))

        t_par = max(a_max, 1) + max(b_max, 1) + 2 * max(c_max, 1) + 2 * max(d_max, 1)
        gt_fit = max(
            granule,
            (12 * 2**20) // (t_par * bt * 8) // granule * granule,
        )
        Gb = len(idx)
        _GT = min(gt_max, gt_fit, ((Gb + granule - 1) // granule) * granule)
        Gp = ((Gb + _GT - 1) // _GT) * _GT

        blocks = dict(
            np_phases=_slice_family(fam["np_phases"], idx, a_max),
            np_params=_slice_family(fam["np_params"], idx, a_max),
            np_counts=fam["np_counts"][:, idx],
            hp_coeffs=_slice_family(fam["hp_coeffs"], idx, b_max),
            hp_params=_slice_family(fam["hp_params"], idx, b_max),
            pp_psi_c=_slice_family(fam["pp_psi_c"], idx, c_max),
            pp_psi_p=_slice_family(fam["pp_psi_p"], idx, c_max),
            pp_phi_c=_slice_family(fam["pp_phi_c"], idx, c_max),
            pp_phi_p=_slice_family(fam["pp_phi_p"], idx, c_max),
            qp_alpha=_slice_family(fam["qp_alpha"], idx, d_max),
            qp_alpha_p=_slice_family(fam["qp_alpha_p"], idx, d_max),
            qp_beta=_slice_family(fam["qp_beta"], idx, d_max),
            qp_beta_p=_slice_family(fam["qp_beta_p"], idx, d_max),
            qp_counts=fam["qp_counts"][:, idx],
            pf_phase=fam["pf_phase"][:, idx],
            pf_ff=fam["pf_ff"][:, idx],
            pf_pow=fam["pf_pow"][:, idx],
            pf_approx=fam["pf_approx"][:, idx],
        )
        # Pad graph axis to Gp and params axis to P.
        for key, arr in blocks.items():
            arr = _pad_to(arr, Gp, 1)
            if arr.ndim == 3:
                arr = _pad_to(arr, P, 2)
            blocks[key] = arr
        T1 = blocks["np_phases"].shape[0]
        T2 = blocks["hp_coeffs"].shape[0]
        T3 = blocks["pp_psi_c"].shape[0]
        T4 = blocks["qp_alpha"].shape[0]
        for k2, k3 in (
            ("np_phases", "np_params"), ("hp_coeffs", "hp_params"),
            ("pp_psi_c", "pp_psi_p"), ("pp_phi_c", "pp_phi_p"),
            ("qp_alpha", "qp_alpha_p"), ("qp_beta", "qp_beta_p"),
        ):
            blocks[k2], blocks[k3] = _ensure_t(blocks[k2], blocks[k3], Gp, P)
        T1, T2, T3, T4 = (max(t, 1) for t in (T1, T2, T3, T4))

        dims = (T1, T2, T3, T4, _GT, Gp, bt)
        buckets.append((blocks, dims))

    _BLOCK_CACHE[cache_key] = (circuit, buckets)
    return buckets


_FORCE = os.environ.get("TSIM_TPU_FUSED", "").strip()


def _use_fused() -> bool:
    # Default on TPU: measured 4.5ms vs 54ms per eval against the XLA tree
    # path on the d3 distillation's largest circuit (G=1024, B=16384, v5e).
    # TSIM_TPU_FUSED=0 forces the XLA path, =1 forces the kernel anywhere.
    if _FORCE == "0":
        return False
    if _FORCE == "1":
        return True
    return jax.default_backend() == "tpu"


def evaluate_abs_auto(circuit: CompiledScalarGraphs, param_vals: Array) -> Array:
    """Dispatch: wide fused kernel for many graphs, transposed kernel for
    few (graphs on sublanes, batch on lanes), XLA path off-TPU.

    The 128-lane-granule wide kernel wastes its tile on G < ~24; the
    transposed small-G kernel tiles (Gt=8, bt=512) so cost tracks the real
    graph count (G=9 at B=2^21 on v5e: 40 ms XLA tree vs ~5 ms transposed).
    """
    if not _use_fused():
        return _evaluate_abs_xla(circuit, param_vals)
    if circuit.num_graphs < 24:
        return _anchor(evaluate_abs_fused_small(circuit, param_vals), param_vals)
    return _anchor(evaluate_abs_fused(circuit, param_vals), param_vals)


# ------------------------------------------------------------ small-G path
# Transposed layout for circuits with few graphs (the norm and early ladder
# plugs: G = 1..23). The wide kernel puts graphs on the 128-lane axis, so a
# 9-graph circuit pays a 128-column tile; here graphs sit on sublanes
# (Gt = 8) and the batch rides the lane axis (bt = 512), so tile area
# tracks the real work. The XLA tree path this replaces was HBM-bound
# (~40 ms per 2^21 shots for G = 9 on v5e; this kernel is ~5 ms).


def _product_body_t(
    dims,
    x_ref,            # (P, Bt) uint8 param values, transposed
    np_phases_ref, np_params_ref, np_counts_ref,
    hp_coeffs_ref, hp_params_ref,
    pp_psi_c_ref, pp_psi_p_ref, pp_phi_c_ref, pp_phi_p_ref,
    qp_alpha_ref, qp_alpha_p_ref, qp_beta_ref, qp_beta_p_ref, qp_counts_ref,
    pf_phase_ref, pf_ff_ref, pf_pow_ref,
):
    T1, T2, T3, T4, Gt = dims
    x = x_ref[...].astype(jnp.int32).astype(_PARITY_DTYPE)  # (P, Bt)
    Bt = x.shape[1]

    def parities(params_ref, T):
        w = params_ref[...].astype(jnp.int32).astype(_PARITY_DTYPE)
        w = w.reshape(T * Gt, -1)
        prod = lax.dot_general(
            w, x, (((1,), (0,)), ((), ())),
            preferred_element_type=_PARITY_ACC,
        )  # (T*Gt, Bt)
        return prod.astype(jnp.int32).reshape(T, Gt, Bt) & 1

    acc = (
        jnp.ones((Gt, Bt), jnp.int32),
        jnp.zeros((Gt, Bt), jnp.int32),
        jnp.zeros((Gt, Bt), jnp.int32),
        jnp.zeros((Gt, Bt), jnp.int32),
    )
    accp = jnp.zeros((Gt, Bt), jnp.int32)

    if T1:
        par = parities(np_params_ref, T1)
        counts = np_counts_ref[0][:, None]  # (Gt, 1)
        phases = np_phases_ref[...]
        for t in range(T1):
            idx = (phases[t][:, None] + 4 * par[t]) & 7
            rot = _k_rot(acc, idx)
            live = (t < counts)
            acc = tuple(
                jnp.where(live, ai + ri, ai) for ai, ri in zip(acc, rot)
            )
            acc, accp = _k_reduce_step(acc, accp)

    if T2:
        par = parities(hp_params_ref, T2)
        coeffs = hp_coeffs_ref[...]
        total = jnp.zeros((Gt, Bt), jnp.int32)
        for t in range(T2):
            total = total + coeffs[t][:, None] * par[t]
        acc = _k_rot(acc, total & 7)

    if T3:
        par_psi = parities(pp_psi_p_ref, T3)
        par_phi = parities(pp_phi_p_ref, T3)
        psi_c = pp_psi_c_ref[...]
        phi_c = pp_phi_c_ref[...]
        expo = jnp.zeros((Gt, Bt), jnp.int32)
        for t in range(T3):
            psi = (psi_c[t][:, None] + par_psi[t]) & 1
            phi = (phi_c[t][:, None] + par_phi[t]) & 1
            expo = expo ^ (psi & phi)
        acc = tuple(ci * (1 - 2 * expo) for ci in acc)

    if T4:
        par_a = parities(qp_alpha_p_ref, T4)
        par_b = parities(qp_beta_p_ref, T4)
        alpha = qp_alpha_ref[...]
        beta = qp_beta_ref[...]
        counts = qp_counts_ref[0][:, None]
        for t in range(T4):
            a = (alpha[t][:, None] + 4 * par_a[t]) & 7
            b = (beta[t][:, None] + 4 * par_b[t]) & 7
            g = (a + b) & 7
            ra, rb, rg = _k_rot(acc, a), _k_rot(acc, b), _k_rot(acc, g)
            live = (t < counts)
            acc = tuple(
                jnp.where(live, ai + rai + rbi - rgi, ai)
                for ai, rai, rbi, rgi in zip(acc, ra, rb, rg)
            )
            acc, accp = _k_reduce_step(acc, accp)

    acc = _k_rot(acc, pf_phase_ref[0][:, None] & 7)
    ff = tuple(pf_ff_ref[j][:, None] * jnp.ones((1, Bt), jnp.int32) for j in range(4))
    acc, accp = _k_mul_acc(acc, accp, ff, 0)
    accp = accp + pf_pow_ref[0][:, None]
    return acc, accp


def _kernel_exact_t(dims, *refs):
    """Exact finisher, transposed: Z[w] tree sum across the sublane axis."""
    out_c_ref, out_p_ref = refs[-2:]
    acc, accp = _product_body_t(dims, *refs[:-2])
    n = dims[-1]
    while n > 1:
        h = n // 2
        a = (tuple(ci[:h] for ci in acc), accp[:h])
        b = (tuple(ci[h : 2 * h] for ci in acc), accp[h : 2 * h])
        d1 = jnp.clip(a[1] - b[1], 0, 30)
        d2 = jnp.clip(b[1] - a[1], 0, 30)
        s1 = jnp.left_shift(jnp.ones_like(d1), d1)
        s2 = jnp.left_shift(jnp.ones_like(d2), d2)
        c = tuple(a[0][j] * s1 + b[0][j] * s2 for j in range(4))
        p = jnp.minimum(a[1], b[1])
        c, p = _k_reduce_step(c, p)
        if n % 2:
            c = tuple(
                jnp.concatenate([c[j], acc[j][-1:]], axis=0) for j in range(4)
            )
            p = jnp.concatenate([p, accp[-1:]], axis=0)
        acc, accp = c, p
        n = (n + 1) // 2 if n % 2 else h

    out_c_ref[...] = jnp.concatenate([acc[j] for j in range(4)], axis=0)[None]
    out_p_ref[...] = _zero_power(acc, accp)[None]


def _kernel_approx_t(dims, *refs):
    """Approximate finisher, transposed."""
    approx_ref, out_ref = refs[-2:]
    acc, accp = _product_body_t(dims, *refs[:-2])
    accp = _zero_power(acc, accp)
    c = tuple(ci.astype(jnp.float32) for ci in acc)
    re = c[0] + (c[1] - c[3]) * _INV_SQRT2
    im = c[2] + (c[1] + c[3]) * _INV_SQRT2
    scale = jnp.exp2(accp.astype(jnp.float32))
    fre = approx_ref[0][:, None] * scale
    fim = approx_ref[1][:, None] * scale
    out_re = jnp.sum(re * fre - im * fim, axis=0)
    out_im = jnp.sum(re * fim + im * fre, axis=0)
    out_ref[...] = jnp.stack([out_re, out_im], axis=0)[None]


def _small_tiles() -> tuple[int, int]:
    """(graph_tile, batch_tile) for the transposed small-G kernel."""
    if jax.default_backend() == "tpu":
        return 8, 512
    return 8, 8


def evaluate_abs_fused_small(circuit: CompiledScalarGraphs, param_vals: Array) -> Array:
    """|amplitude| via the transposed kernel (few graphs, batch on lanes)."""
    B, P_in = param_vals.shape
    gt, bt = _small_tiles()
    P = max(P_in, 8)
    Bp = max(bt, ((B + bt - 1) // bt) * bt)
    xT = _pad_to(_pad_to(param_vals.astype(jnp.uint8), P, 1), Bp, 0).T
    approx = bool(circuit.prefactor.has_approximate_floatfactors)

    blocks, dims = _prepared_small(circuit, P)
    T1, T2, T3, T4, Gp = dims
    # One graph tile covering all of Gp (<= 24): Mosaic requires the last
    # block dim to be 128-divisible OR equal to the array dim, so a gt=8
    # tile over a Gp=16/24 axis fails lowering. Gp is sublane-aligned
    # (multiple of 8) and small, so a full-axis tile is both legal and
    # cheap; the grid then runs over the batch axis only.
    gt = Gp
    n_gt = 1
    kdims = (T1, T2, T3, T4, gt)

    T_of = {1: T1, 2: T2, 3: T3, 4: T4}

    def spec2(f):
        t = 4 if f == "ff" else T_of[f]
        return pl.BlockSpec((max(t, 1), gt), lambda i, j: (0, j))

    def spec3(f):
        return pl.BlockSpec((max(T_of[f], 1), gt, P), lambda i, j: (0, j, 0))

    spec_c = pl.BlockSpec((1, gt), lambda i, j: (0, j))
    grid = (Bp // bt, n_gt)
    in_specs = _family_in_specs(
        spec2, spec3, spec_c, pl.BlockSpec((P, bt), lambda i, j: (0, i))
    )
    inputs = _family_inputs(xT, blocks)
    interpret = jax.default_backend() != "tpu"
    if approx:
        out = pl.pallas_call(
            functools.partial(_kernel_approx_t, kdims),
            grid=grid,
            in_specs=in_specs + [pl.BlockSpec((2, gt), lambda i, j: (0, j))],
            out_specs=pl.BlockSpec((1, 2, bt), lambda i, j: (j, 0, i)),
            out_shape=jax.ShapeDtypeStruct((n_gt, 2, Bp), jnp.float32),
            interpret=interpret,
        )(*inputs, blocks["pf_approx"])
        total = jnp.sum(out, axis=0)  # (2, Bp)
        return jnp.sqrt(total[0] ** 2 + total[1] ** 2)[:B]
    out_c, out_p = pl.pallas_call(
        functools.partial(_kernel_exact_t, kdims),
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, 4, bt), lambda i, j: (j, 0, i)),
            pl.BlockSpec((1, 1, bt), lambda i, j: (j, 0, i)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_gt, 4, Bp), jnp.int32),
            jax.ShapeDtypeStruct((n_gt, 1, Bp), jnp.int32),
        ],
        interpret=interpret,
    )(*inputs)
    # (n_gt, 4, Bp) -> exact sum across graph tiles.
    coeffs = jnp.transpose(out_c, (1, 2, 0))  # (4, Bp, n_gt)
    power = jnp.transpose(out_p[:, 0, :], (1, 0))  # (Bp, n_gt)
    esa = ExactScalarArray.from_coeffs(coeffs, power).sum(axis=-1)
    re, im = _coeffs_to_real_imag(esa.coeffs)
    mag = jnp.sqrt(re * re + im * im) * jnp.exp2(esa.power.astype(jnp.float32))
    return mag[:B]


_SMALL_CACHE: dict = {}
_SMALL_DEVICE_CACHE: dict = {}


def _prepared_small(circuit: CompiledScalarGraphs, P: int):
    cache_key = (id(circuit), P, jax.default_backend())
    entry = _SMALL_CACHE.get(cache_key)
    if entry is None or entry[0] is not circuit:
        gt, bt = _small_tiles()
        G = circuit.num_graphs
        Gp = ((G + gt - 1) // gt) * gt
        blocks = _family_blocks(circuit, Gp, P)
        for k2, k3 in (
            ("np_phases", "np_params"), ("hp_coeffs", "hp_params"),
            ("pp_psi_c", "pp_psi_p"), ("pp_phi_c", "pp_phi_p"),
            ("qp_alpha", "qp_alpha_p"), ("qp_beta", "qp_beta_p"),
        ):
            blocks[k2], blocks[k3] = _ensure_t(blocks[k2], blocks[k3], Gp, P)
        dims = (
            blocks["np_phases"].shape[0], blocks["hp_coeffs"].shape[0],
            blocks["pp_psi_c"].shape[0], blocks["qp_alpha"].shape[0], Gp,
        )
        entry = (circuit, (blocks, dims))
        _SMALL_CACHE[cache_key] = entry
    blocks, dims = entry[1]
    if _tracing():
        return blocks, dims
    dentry = _SMALL_DEVICE_CACHE.get(cache_key)
    if dentry is not None and dentry[0] is circuit:
        return dentry[1]
    dev = ({k: jax.device_put(v) for k, v in blocks.items()}, dims)
    _SMALL_DEVICE_CACHE[cache_key] = (circuit, dev)
    return dev
