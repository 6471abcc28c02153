"""Sampling-mode float32 Pallas kernel for compiled-scalar-graph evaluation.

The exact kernels in ``pallas_evaluate.py`` carry four int32 Z[w]
coefficients plus a power-of-two through the whole term product, paying
~29 VPU ops per term (rotation select chains, adds, and an evenness
reduce step with a serial dependency). Sampling does not need exact
arithmetic: the Bernoulli draw p = |amp_1|/|amp_prefix| tolerates ~1e-4
relative error, and the reference implementation evaluates the same
products in complex float32 on CUDA (reference ``src/tsim/sampler.py``
evaluation path; its kernels accumulate c64). This module evaluates the
term product directly in complex float32 with all static per-term phase
factors folded into host-precomputed cos/sin tables:

* node phases: ``1 + w^(phi + 4p)`` = ``1 + sigma * (cos, sin)(phi*pi/4)``
  with ``sigma = 1 - 2p`` — one FMA + one mul to build the factor, six
  ops to multiply it in: ~11 ops/term on two f32 channels (vs ~29 on
  four int32 channels, with no reduce dependency chain).
* phase pairs: ``1 + w^a + w^b - w^(a+b)`` with ``a = alpha + 4p_a``
  becomes ``1 + s_a*w^alpha + s_b*w^beta - s_a s_b w^(alpha+beta)`` —
  three static cos/sin table pairs, ~15 ops/term.
* half-pi phases: integer coefficient sum then one staged rotation.
* pi products: float xor-accumulated sign.
* prefactor: the full static prefactor (w^phase, Z[w] floatfactor,
  2^power2, approximate factor) prefolds into ONE complex pair per
  graph on the host.

Graph partials sum in plain f32 (no shift-align tree). Eligibility is
gated on dynamic range (see :func:`sample_eligible`); ineligible
circuits fall back to the exact kernels.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array, lax
from jax.experimental import pallas as pl

from .compile import CompiledScalarGraphs
from .evaluate import _anchor
from .evaluate import evaluate_abs as _evaluate_abs_xla
from .pallas_evaluate import (
    _pad_to,
    _prepared_buckets_np,
    _prepared_small,
    _small_tiles,
    _tracing,
    _use_fused,
)


def _sample_bt() -> int:
    """Batch tile for the sampling kernel (independent of the exact
    kernel's: the f32 body carries 2 channels instead of 4 int32 + power,
    so much larger batch tiles fit VMEM — bt=512 measured ~25% faster
    than 128 on the 2-check cultivation rungs)."""
    if jax.default_backend() == "tpu":
        return int(os.environ.get("TSIM_TPU_SAMPLE_BT", 512))
    return 8

def _small_sample_tiles() -> tuple[int, int]:
    """(graph_tile, batch_tile) for the transposed small-G sampling path.

    Overridable batch tile: at G <= 24 the per-grid-step fixed cost
    dominates (a 1-graph rung measured 1.6 ms at bt=512 over 2^17 shots —
    ~6 us/step of grid overhead against microseconds of math), and the
    transposed layout's VMEM footprint is a few (G, bt) planes, so much
    wider tiles are safe and amortize the step cost."""
    gt, bt = _small_tiles()
    if jax.default_backend() == "tpu":
        bt = int(os.environ.get("TSIM_TPU_SAMPLE_SMALL_BT", bt))
    return gt, bt


_SQRT_HALF = np.float32(0.7071067811865476)

# w^k = exp(i k pi / 4) tables, float32 exact-dyadic where possible.
_WC = np.cos(np.arange(8) * np.pi / 4).astype(np.float32)
_WS = np.sin(np.arange(8) * np.pi / 4).astype(np.float32)
_WC[[2, 6]] = 0.0
_WS[[0, 4]] = 0.0


def _rot_staged(re, im, k):
    """(re, im) * w^k for a data-dependent int32 k (staged on k's bits)."""
    b0 = (k & 1) == 1
    nre = (re - im) * _SQRT_HALF
    nim = (re + im) * _SQRT_HALF
    re, im = jnp.where(b0, nre, re), jnp.where(b0, nim, im)
    b1 = (k & 2) == 2
    re, im = jnp.where(b1, -im, re), jnp.where(b1, re, im)
    b2 = (k & 4) == 4
    return jnp.where(b2, -re, re), jnp.where(b2, -im, im)


def _parity_term_f32(params_ref, t, x_mxu, transposed):
    """Float32 0/1 parities for ONE term: (Bt, Gt) (or (Gt, Bt)) dot.

    One small dot per term instead of one giant (Bt, T, Gt) batch: the
    batched form materializes T-axis intermediates of 15+ MB per grid
    step (far past VMEM) and every per-term slice reads 1/8 of each
    (8, 128) tile — measured 3-4x off the VPU roofline on the
    cultivation ladder. Per-term dots keep every operand and result
    VMEM-resident at (Bt, Gt).

    Operands are bf16 (tables ship bf16 from the host, x casts once per
    tile): 0/1 values are exact in bf16 and the accumulator is f32, so
    the parity sums stay exact while the MXU runs at its 4x bf16 peak —
    this kernel is matmul-bound (measured at the f32 MXU roofline on
    the 2-check cultivation rungs before the switch).
    """
    w = params_ref[t]  # (Gt, P) bf16
    if transposed:
        prod = lax.dot_general(
            w, x_mxu, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Gt, Bt)
    else:
        prod = lax.dot_general(
            x_mxu, w, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (Bt, Gt)
    # mod 2 without an int roundtrip: row sums are <= P, exactly integral.
    return prod - 2.0 * jnp.floor(prod * 0.5)


def _product_body_sample(
    dims,
    transposed,
    x_ref,            # wide: (Bt, P) uint8; transposed: (P, Bt)
    np_cos_ref,       # (T1, Gt) f32, zeroed on dead slots
    np_sin_ref,       # (T1, Gt) f32, zeroed on dead slots
    np_params_ref,    # (T1, Gt, P) bf16
    hp_coeffs_ref,    # (T2, Gt) int32
    hp_params_ref,    # (T2, Gt, P) bf16
    pp_psi_c_ref,     # (T3, Gt) int32
    pp_psi_p_ref,     # (T3, Gt, P) bf16
    pp_phi_c_ref,     # (T3, Gt) int32
    pp_phi_p_ref,     # (T3, Gt, P) bf16
    qp_ca_ref,        # (T4, Gt) f32  cos(alpha pi/4), zeroed on dead slots
    qp_sa_ref,        # (T4, Gt) f32
    qp_cb_ref,        # (T4, Gt) f32  cos(beta pi/4)
    qp_sb_ref,        # (T4, Gt) f32
    qp_cg_ref,        # (T4, Gt) f32  cos((alpha+beta) pi/4)
    qp_sg_ref,        # (T4, Gt) f32
    qp_alpha_p_ref,   # (T4, Gt, P) bf16
    qp_beta_p_ref,    # (T4, Gt, P) bf16
    pre_ref,          # (2, Gt) f32 prefolded complex prefactor
):
    T1, T2, T3, T4, Gt = dims
    x = x_ref[...].astype(jnp.int32).astype(jnp.bfloat16)

    def bc(v):
        # Broadcast a (Gt,) per-graph vector across the batch axis.
        return v[:, None] if transposed else v[None, :]

    if transposed:
        shape = (Gt, x.shape[1])
    else:
        shape = (x.shape[0], Gt)
    re = jnp.ones(shape, jnp.float32)
    im = jnp.zeros(shape, jnp.float32)

    def par_of(params_ref, t):
        return _parity_term_f32(params_ref, t, x, transposed)

    # ---- node phases: prod of (1 + sigma * w^phi) -----------------------
    # Factor as fr = (1 + c) - 2c*p, fi = s - 2s*p (one FMA each); dead
    # (t, g) slots have c = s = 0 host-folded in, so the factor is exactly
    # 1 and no live mask is needed.
    if T1:
        cos_t = np_cos_ref[...]
        sin_t = np_sin_ref[...]
        for t in range(T1):
            p = par_of(np_params_ref, t)
            c = bc(cos_t[t])
            s = bc(sin_t[t])
            fr = (1.0 + c) - (2.0 * c) * p
            fi = s - (2.0 * s) * p
            nre = re * fr - im * fi
            nim = re * fi + im * fr
            re, im = nre, nim

    # ---- half-pi phases: single w^(sum of coeffs*parity mod 8) ----------
    if T2:
        coeffs = hp_coeffs_ref[...].astype(jnp.float32)
        total = jnp.zeros(shape, jnp.float32)
        for t in range(T2):
            total = total + bc(coeffs[t]) * par_of(hp_params_ref, t)
        re, im = _rot_staged(re, im, total.astype(jnp.int32) & 7)

    # ---- pi products: global sign (-1)^(sum psi*phi mod 2) ---------------
    # XOR over t == parity of the sum: accumulate psi*phi, one final mod-2.
    if T3:
        psi_c = pp_psi_c_ref[...].astype(jnp.float32)
        phi_c = pp_phi_c_ref[...].astype(jnp.float32)
        s = jnp.zeros(shape, jnp.float32)
        for t in range(T3):
            # psi = psi_c XOR parity, as floats: c + (1-2c)*p.
            pc, qc = bc(psi_c[t]), bc(phi_c[t])
            psi = pc + (1.0 - 2.0 * pc) * par_of(pp_psi_p_ref, t)
            phi = qc + (1.0 - 2.0 * qc) * par_of(pp_phi_p_ref, t)
            s = s + psi * phi
        expo = s - 2.0 * jnp.floor(s * 0.5)
        sign = 1.0 - 2.0 * expo
        re = re * sign
        im = im * sign

    # ---- phase pairs: prod of (1 + s_a w^alpha + s_b w^beta - s_a s_b w^g)
    # Dead (t, g) slots have all six tables zeroed, folding the factor to
    # exactly 1, so no live mask is needed.
    if T4:
        ca, sa = qp_ca_ref[...], qp_sa_ref[...]
        cb, sb = qp_cb_ref[...], qp_sb_ref[...]
        cg, sg = qp_cg_ref[...], qp_sg_ref[...]
        for t in range(T4):
            s_a = 1.0 - 2.0 * par_of(qp_alpha_p_ref, t)
            s_b = 1.0 - 2.0 * par_of(qp_beta_p_ref, t)
            s_g = s_a * s_b
            fr = 1.0 + s_a * bc(ca[t]) + s_b * bc(cb[t]) - s_g * bc(cg[t])
            fi = s_a * bc(sa[t]) + s_b * bc(sb[t]) - s_g * bc(sg[t])
            nre = re * fr - im * fi
            nim = re * fi + im * fr
            re, im = nre, nim

    # ---- prefolded static prefactor --------------------------------------
    pr = bc(pre_ref[0])
    pi_ = bc(pre_ref[1])
    return re * pr - im * pi_, re * pi_ + im * pr


def _product_body_sample_packed(
    dims,
    transposed,
    x_ref,            # wide: (Bt, P) uint8; transposed: (P, Bt)
    np_cos_ref,       # (T1, Gt) f32, zeroed on dead slots
    np_sin_ref,
    np_pk_ref,        # (1, P, T1*Gt) bf16 term-packed params
    hp_coeffs_ref,    # (T2, Gt) int32
    hp_pk_ref,        # (1, P, T2*Gt) bf16
    pp_psi_c_ref,     # (T3, Gt) int32
    pp_psi_pk_ref,    # (1, P, T3*Gt) bf16
    pp_phi_c_ref,
    pp_phi_pk_ref,
    qp_ca_ref, qp_sa_ref, qp_cb_ref, qp_sb_ref, qp_cg_ref, qp_sg_ref,
    qp_alpha_pk_ref,  # (1, P, T4*Gt) bf16
    qp_beta_pk_ref,
    pre_ref,          # (2, Gt) f32
):
    """Wide layout with TERM-PACKED parity dots.

    One (Bt, P) x (P, T*Gt) bf16 dot per family instead of one small dot
    per term: the parity matmuls' N axis grows T-fold, so the MXU streams
    one long contraction per family and the per-dot launch/drain overhead
    (measured as most of the gap to the roofline at P ~ 40) amortizes.
    Per-term factors then read lane-aligned (Bt, Gt) slices of the packed
    parity block (Gt is a multiple of the 128-lane granule on TPU).
    """
    T1, T2, T3, T4, Gt = dims
    x = x_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
    if transposed:
        shape = (Gt, x.shape[1])
    else:
        shape = (x.shape[0], Gt)
    re = jnp.ones(shape, jnp.float32)
    im = jnp.zeros(shape, jnp.float32)

    def bc(v):
        # Broadcast a (Gt,) per-graph vector across the batch axis.
        return v[:, None] if transposed else v[None, :]

    def parities(pk_ref):
        if transposed:
            w = pk_ref[...]  # (T*Gt, P)
            prod = lax.dot_general(
                w, x, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (T*Gt, Bt)
        else:
            w = pk_ref[0]  # (P, T*Gt)
            prod = lax.dot_general(
                x, w, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (Bt, T*Gt); row sums <= P, exactly integral in f32
        return prod - 2.0 * jnp.floor(prod * 0.5)

    def tslice(par, t):
        if transposed:
            return par[t * Gt : (t + 1) * Gt, :]
        return par[:, t * Gt : (t + 1) * Gt]

    if T1:
        par = parities(np_pk_ref)
        cos_t = np_cos_ref[...]
        sin_t = np_sin_ref[...]
        for t in range(T1):
            p = tslice(par, t)
            c = bc(cos_t[t])
            s = bc(sin_t[t])
            fr = (1.0 + c) - (2.0 * c) * p
            fi = s - (2.0 * s) * p
            nre = re * fr - im * fi
            nim = re * fi + im * fr
            re, im = nre, nim

    if T2:
        par = parities(hp_pk_ref)
        coeffs = hp_coeffs_ref[...].astype(jnp.float32)
        total = jnp.zeros(shape, jnp.float32)
        for t in range(T2):
            total = total + bc(coeffs[t]) * tslice(par, t)
        re, im = _rot_staged(re, im, total.astype(jnp.int32) & 7)

    if T3:
        par_psi = parities(pp_psi_pk_ref)
        par_phi = parities(pp_phi_pk_ref)
        psi_c = pp_psi_c_ref[...].astype(jnp.float32)
        phi_c = pp_phi_c_ref[...].astype(jnp.float32)
        s = jnp.zeros(shape, jnp.float32)
        for t in range(T3):
            pc = bc(psi_c[t])
            qc = bc(phi_c[t])
            psi = pc + (1.0 - 2.0 * pc) * tslice(par_psi, t)
            phi = qc + (1.0 - 2.0 * qc) * tslice(par_phi, t)
            s = s + psi * phi
        expo = s - 2.0 * jnp.floor(s * 0.5)
        sign = 1.0 - 2.0 * expo
        re = re * sign
        im = im * sign

    if T4:
        par_a = parities(qp_alpha_pk_ref)
        par_b = parities(qp_beta_pk_ref)
        ca, sa = qp_ca_ref[...], qp_sa_ref[...]
        cb, sb = qp_cb_ref[...], qp_sb_ref[...]
        cg, sg = qp_cg_ref[...], qp_sg_ref[...]
        for t in range(T4):
            s_a = 1.0 - 2.0 * tslice(par_a, t)
            s_b = 1.0 - 2.0 * tslice(par_b, t)
            s_g = s_a * s_b
            fr = 1.0 + s_a * bc(ca[t]) + s_b * bc(cb[t]) - s_g * bc(cg[t])
            fi = s_a * bc(sa[t]) + s_b * bc(sb[t]) - s_g * bc(sg[t])
            nre = re * fr - im * fi
            nim = re * fi + im * fr
            re, im = nre, nim

    pr = bc(pre_ref[0])
    pi_ = bc(pre_ref[1])
    return re * pr - im * pi_, re * pi_ + im * pr


def _kernel_sample(dims, *refs):
    """Wide layout (term-packed dots): sum across lanes -> (1, Bt, 2)."""
    out_ref = refs[-1]
    re, im = _product_body_sample_packed(dims, False, *refs[:-1])
    out_ref[...] = jnp.stack(
        [jnp.sum(re, axis=1), jnp.sum(im, axis=1)], axis=1
    )[None]


def _kernel_sample_unpacked(dims, *refs):
    """Wide layout, per-term dots (TSIM_TPU_SAMPLE_TPACK=0 fallback)."""
    out_ref = refs[-1]
    re, im = _product_body_sample(dims, False, *refs[:-1])
    out_ref[...] = jnp.stack(
        [jnp.sum(re, axis=1), jnp.sum(im, axis=1)], axis=1
    )[None]


def _kernel_sample_t(dims, *refs):
    """Transposed layout (term-packed): sum across sublanes -> (1, 2, Bt)."""
    out_ref = refs[-1]
    re, im = _product_body_sample_packed(dims, True, *refs[:-1])
    out_ref[...] = jnp.stack(
        [jnp.sum(re, axis=0), jnp.sum(im, axis=0)], axis=0
    )[None]


def _kernel_sample_t_unpacked(dims, *refs):
    """Transposed layout, per-term dots (TSIM_TPU_SAMPLE_TPACK=0)."""
    out_ref = refs[-1]
    re, im = _product_body_sample(dims, True, *refs[:-1])
    out_ref[...] = jnp.stack(
        [jnp.sum(re, axis=0), jnp.sum(im, axis=0)], axis=0
    )[None]


# ------------------------------------------------------------- host tables

def _complex_of_coeffs(c: np.ndarray) -> np.ndarray:
    """(4, G) int Z[w] coefficients (basis 1, w, w^2, w^3) -> (2, G) f64."""
    r = np.sqrt(0.5)
    re = c[0] + (c[1] - c[3]) * r
    im = c[2] + (c[1] + c[3]) * r
    return np.stack([re, im])


_TPACK_PROBE: bool | None = None


def _tpack_probe() -> bool:
    """One-time on-device self-test of the packed kernel's lowering.

    Runs a miniature packed-layout pallas_call (one family, 2 terms,
    one 128-lane graph tile) the first time the packed path is about to
    be used on a TPU backend; a Mosaic lowering/compile failure flips the
    process to the per-term fallback instead of crashing sampling."""
    global _TPACK_PROBE
    if _TPACK_PROBE is None:
        try:
            T1, Gt, P, bt = 2, 128, 8, 128

            def body(x_ref, pk_ref, cos_ref, out_ref):
                x = x_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
                w = pk_ref[0]
                prod = lax.dot_general(
                    x, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                par = prod - 2.0 * jnp.floor(prod * 0.5)
                acc = jnp.ones((bt, Gt), jnp.float32)
                for t in range(T1):
                    acc = acc * (
                        1.0
                        - 2.0 * par[:, t * Gt : (t + 1) * Gt]
                        * cos_ref[t][None, :]
                    )
                out_ref[...] = jnp.sum(acc, axis=1, keepdims=True)

            out = pl.pallas_call(
                body,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((bt, P), lambda i: (0, 0)),
                    pl.BlockSpec((1, P, T1 * Gt), lambda i: (0, 0, 0)),
                    pl.BlockSpec((T1, Gt), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((bt, 1), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((bt, 1), jnp.float32),
                interpret=jax.default_backend() != "tpu",
            )(
                jnp.zeros((bt, P), jnp.uint8),
                jnp.zeros((1, P, T1 * Gt), jnp.bfloat16),
                jnp.zeros((T1, Gt), jnp.float32),
            )
            jax.block_until_ready(out)

            Gp = 8

            def body_t(x_ref, pk_ref, cos_ref, out_ref):
                x = x_ref[...].astype(jnp.int32).astype(jnp.bfloat16)
                w = pk_ref[...]
                prod = lax.dot_general(
                    w, x, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                par = prod - 2.0 * jnp.floor(prod * 0.5)
                acc = jnp.ones((Gp, bt), jnp.float32)
                for t in range(T1):
                    acc = acc * (
                        1.0
                        - 2.0 * par[t * Gp : (t + 1) * Gp, :]
                        * cos_ref[t][:, None]
                    )
                out_ref[...] = jnp.sum(acc, axis=0, keepdims=True)

            out_t = pl.pallas_call(
                body_t,
                grid=(1,),
                in_specs=[
                    pl.BlockSpec((P, bt), lambda i: (0, 0)),
                    pl.BlockSpec((T1 * Gp, P), lambda i: (0, 0)),
                    pl.BlockSpec((T1, Gp), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((1, bt), lambda i: (0, 0)),
                out_shape=jax.ShapeDtypeStruct((1, bt), jnp.float32),
                interpret=jax.default_backend() != "tpu",
            )(
                jnp.zeros((P, bt), jnp.uint8),
                jnp.zeros((T1 * Gp, P), jnp.bfloat16),
                jnp.zeros((T1, Gp), jnp.float32),
            )
            jax.block_until_ready(out_t)
            _TPACK_PROBE = True
        except Exception:
            _TPACK_PROBE = False
    return _TPACK_PROBE


def _use_tpack() -> bool:
    """Term-packed parity dots for the wide layout (escape hatch)."""
    if os.environ.get("TSIM_TPU_SAMPLE_TPACK", "1") == "0":
        return False
    if jax.default_backend() != "tpu":
        return True  # interpret mode; lowering cannot fail
    return _tpack_probe()


def _small_g_cutoff() -> int:
    """Graph-count threshold below which the transposed layout is used.

    The transposed layout puts graphs on sublanes and the batch on lanes,
    so a G=32 rung pays no lane padding (the wide layout pads it 4x into
    a 128-lane graph tile). Tunable for on-chip sweeps."""
    return int(os.environ.get("TSIM_TPU_SAMPLE_SMALL_G", 24))


def _pack_params(arr: np.ndarray, gt: int) -> np.ndarray:
    """(T, Gp, P) family params -> (n_gt, P, Tp*gt) term-packed weights.

    Column ``t*gt + g`` of tile ``j`` is term ``t`` of graph ``j*gt + g``,
    so the packed parity dot's output slices per-term blocks lane-aligned
    (gt is a multiple of the 128-lane granule on TPU)."""
    T, Gp, P = arr.shape
    Tp = max(T, 1)
    if T == 0:
        arr = np.zeros((1, Gp, P), arr.dtype)
    n_gt = max(Gp // gt, 1)
    return (
        arr.reshape(Tp, n_gt, gt, P)
        .transpose(1, 3, 0, 2)
        .reshape(n_gt, P, Tp * gt)
    )


def _pack_params_t(arr: np.ndarray) -> np.ndarray:
    """(T, Gp, P) family params -> (Tp*Gp, P) for the transposed layout.

    Row ``t*Gp + g`` is term ``t`` of graph ``g`` (a plain reshape), so
    the packed parity dot's output slices per-term blocks sublane-aligned
    (Gp is padded to the 8-sublane granule)."""
    T, Gp, P = arr.shape
    if T == 0:
        return np.zeros((Gp, P), arr.dtype)
    return np.ascontiguousarray(arr.reshape(T * Gp, P))


def _sample_tables(
    blocks: dict,
    bias: int = 0,
    pack_gt: int | None = None,
    pack_small: bool = False,
) -> dict:
    """Derive the f32 cos/sin + prefold tables from exact bucket blocks.

    ``bias``: per-circuit power-of-two rescale folded OUT of the prefold
    (the caller multiplies the summed result by 2^bias). A deep ladder
    rung can carry a large COMMON prefactor scale (grown cultivation full
    plug: power2 in [-89, -73] relative to the component base) that is
    pure headroom waste inside the kernel — products would sit ~2^-100
    and their squares would flush to zero on TPU (denormals) — while the
    spread around it is small.
    """
    # The small-path block cache may hand back device arrays; the prefold
    # needs f64 on host (exp2 of power2 overflows f32 intermediates).
    blocks = {k: np.asarray(v) for k, v in blocks.items()}
    bf16 = jnp.bfloat16.dtype  # numpy-compatible ml_dtypes bfloat16
    np_ph = blocks["np_phases"] & 7
    qa = blocks["qp_alpha"] & 7
    qb = blocks["qp_beta"] & 7
    qg = (blocks["qp_alpha"] + blocks["qp_beta"]) & 7
    # Dead (t, g) slots (t >= per-graph term count) get zeroed cos/sin
    # tables, which folds their factor to exactly 1 — the kernel then
    # needs no live masks at all.
    t1 = np_ph.shape[0]
    live1 = np.arange(t1)[:, None] < blocks["np_counts"][0][None, :]
    t4 = qa.shape[0]
    live4 = np.arange(t4)[:, None] < blocks["qp_counts"][0][None, :]
    pre = _complex_of_coeffs(blocks["pf_ff"].astype(np.float64))
    phase = blocks["pf_phase"][0] & 7
    wph = np.exp(1j * np.pi / 4 * phase)
    prec = (pre[0] + 1j * pre[1]) * wph * np.exp2(
        blocks["pf_pow"][0].astype(np.float64) - bias
    )
    prec = prec * (blocks["pf_approx"][0] + 1j * blocks["pf_approx"][1])
    if pack_gt is not None:
        # Wide layout: params ship term-packed for the one-dot-per-family
        # parity matmuls (see _product_body_sample_packed).
        def prm(key):
            return _pack_params(blocks[key], pack_gt).astype(bf16)
    elif pack_small:
        def prm(key):
            return _pack_params_t(blocks[key]).astype(bf16)
    else:
        def prm(key):
            return blocks[key].astype(bf16)
    return dict(
        np_cos=_WC[np_ph] * live1, np_sin=_WS[np_ph] * live1,
        np_params=prm("np_params"),
        hp_coeffs=blocks["hp_coeffs"],
        hp_params=prm("hp_params"),
        pp_psi_c=blocks["pp_psi_c"],
        pp_psi_p=prm("pp_psi_p"),
        pp_phi_c=blocks["pp_phi_c"],
        pp_phi_p=prm("pp_phi_p"),
        qp_ca=_WC[qa] * live4, qp_sa=_WS[qa] * live4,
        qp_cb=_WC[qb] * live4, qp_sb=_WS[qb] * live4,
        qp_cg=_WC[qg] * live4, qp_sg=_WS[qg] * live4,
        qp_alpha_p=prm("qp_alpha_p"),
        qp_beta_p=prm("qp_beta_p"),
        pre=np.stack([prec.real, prec.imag]).astype(np.float32),
    )


_TABLE_KEYS = [
    "np_cos", "np_sin", "np_params",
    "hp_coeffs", "hp_params",
    "pp_psi_c", "pp_psi_p", "pp_phi_c", "pp_phi_p",
    "qp_ca", "qp_sa", "qp_cb", "qp_sb", "qp_cg", "qp_sg",
    "qp_alpha_p", "qp_beta_p", "pre",
]


def _sample_specs(dims, P, x_spec, pre_spec, packed=None):
    """BlockSpecs matching _TABLE_KEYS order (x first, pre last).

    Grid order is (graph_tile, batch_tile) with the batch axis fastest:
    the family tables' block index then stays constant across consecutive
    grid steps, so Mosaic skips their re-DMA and only the small x tile
    streams. The batch-major order re-streamed every table for every
    batch tile (~4 GB per heavy-rung eval; measured as a 77 ms DMA floor
    in dev/kernel_ablate.py).

    ``packed``: param tables ship as (n_gt, P, T*Gt) term-packed weight
    matrices (wide layout; see _product_body_sample_packed).
    """
    T1, T2, T3, T4, Gt = dims

    def s2(t):
        return pl.BlockSpec((max(t, 1), Gt), lambda j, i: (0, j))

    if packed == "wide":
        def s3(t):
            return pl.BlockSpec(
                (1, P, max(t, 1) * Gt), lambda j, i: (j, 0, 0)
            )
    elif packed == "transposed":
        def s3(t):
            return pl.BlockSpec((max(t, 1) * Gt, P), lambda j, i: (0, 0))
    else:
        def s3(t):
            return pl.BlockSpec((max(t, 1), Gt, P), lambda j, i: (0, j, 0))

    return [
        x_spec,
        s2(T1), s2(T1), s3(T1),
        s2(T2), s3(T2),
        s2(T3), s3(T3), s2(T3), s3(T3),
        s2(T4), s2(T4), s2(T4), s2(T4), s2(T4), s2(T4),
        s3(T4), s3(T4),
        pre_spec,
    ]


# ------------------------------------------------------------- eligibility

def sample_eligible(circuit: CompiledScalarGraphs) -> bool:
    """True if the f32 dynamic range safely covers this circuit's products.

    Per-graph |product| is bounded by 2^T1 * 4^T4 and below (nonzero case)
    by |1+w^3|^T1 * |..|^T4 >= 2^(-0.4 T1 - 0.8 T4). The prefactor's
    COMMON power-of-two scale is folded out of the kernel (``bias`` in
    :func:`_sample_tables`; the result is rescaled after the sum), so only
    its per-graph SPREAD consumes exponent budget. Keep the budget well
    inside f32's +-126, and the bias itself within the two-step rescale's
    reach.
    """
    t1 = int(np.asarray(circuit.node_phases.counts).max(initial=0))
    t4 = int(np.asarray(circuit.phase_pairs.counts).max(initial=0))
    p2 = np.asarray(circuit.prefactor.power2)
    # No ``initial=`` clamp: with all-negative powers (deep rungs) a
    # 0-clamped max reads the whole scale as spread.
    spread = int(p2.max() - p2.min()) if p2.size else 0
    bias = int(p2.max()) if p2.size else 0
    # Positive bias multiplies back INTO the result after the sum is
    # squared, so it consumes the same exponent budget as the product
    # terms: the rescaled magnitude reaches 2^(t1+2t4+bias), and values
    # below ~2^(bias-63) flush to zero inside total**2. Bound the joint
    # budget. Negative bias only risks underflow-to-zero of values the
    # exact path's f32 output would also flush, so it gets the full
    # two-step rescale reach.
    return t1 + 2 * t4 + spread + max(bias, 0) <= 110 and bias >= -200


# ------------------------------------------------------------- entry point

_SAMPLE_CACHE: dict = {}
_SAMPLE_DEVICE_CACHE: dict = {}


def _sample_bias(circuit: CompiledScalarGraphs) -> int:
    """Per-circuit power-of-two prefold rescale (see _sample_tables)."""
    p2 = np.asarray(circuit.prefactor.power2)
    return int(p2.max()) if p2.size else 0


def _prepared_sample_buckets(circuit: CompiledScalarGraphs, P: int):
    """Returns ``(buckets, bias)``: every bucket's prefold is scaled by
    2^-bias; the caller multiplies the summed result back."""
    key = (
        id(circuit), P, jax.default_backend(), _use_tpack(),
        _small_g_cutoff(),
    )
    entry = _SAMPLE_CACHE.get(key)
    if entry is None or entry[0] is not circuit:
        bias = _sample_bias(circuit)
        if circuit.num_graphs < _small_g_cutoff():
            blocks, dims = _prepared_small(circuit, P)
            T1, T2, T3, T4, Gp = dims
            buckets = [
                (
                    _sample_tables(blocks, bias, pack_small=_use_tpack()),
                    (T1, T2, T3, T4, Gp, Gp, 0),
                )
            ]
        else:
            pk = _use_tpack()
            buckets = [
                (
                    _sample_tables(
                        blocks, bias, pack_gt=dims[4] if pk else None
                    ),
                    dims,
                )
                for blocks, dims in _prepared_buckets_np(circuit, P)
            ]
        entry = (circuit, buckets, bias)
        _SAMPLE_CACHE[key] = entry
    buckets, bias = entry[1], entry[2]
    if _tracing():
        return buckets, bias
    dentry = _SAMPLE_DEVICE_CACHE.get(key)
    if dentry is not None and dentry[0] is circuit:
        return dentry[1], bias
    dev = [
        ({k: jax.device_put(v) for k, v in tables.items()}, dims)
        for tables, dims in buckets
    ]
    _SAMPLE_DEVICE_CACHE[key] = (circuit, dev)
    return dev, bias


def _run_sample_bucket(tables, dims, x, Bp, P):
    T1, T2, T3, T4, _GT, Gp, bt_wide = dims
    kdims = (T1, T2, T3, T4, _GT)
    interpret = jax.default_backend() != "tpu"
    inputs = [tables[k] for k in _TABLE_KEYS]
    if bt_wide == 0:
        # Transposed small-G layout: one full-axis graph tile.
        gt, bt = _small_sample_tiles()
        pk = _use_tpack()
        if pk:
            # The packed parity planes are (T*Gp, bt) f32, two live for
            # the psi/phi and alpha/beta families: shrink wide batch
            # tiles so high-term circuits stay inside scoped VMEM.
            t_big = max(T1, T2, 2 * T3, 2 * T4, 1)
            pack_cap = int(
                os.environ.get("TSIM_TPU_SAMPLE_PACK_PLANE", 1 << 21)
            )
            while bt > 512 and bt * _GT * t_big > pack_cap:
                bt //= 2
        kernel = _kernel_sample_t if pk else _kernel_sample_t_unpacked
        x_spec = pl.BlockSpec((P, bt), lambda j, i: (0, i))
        pre_spec = pl.BlockSpec((2, _GT), lambda j, i: (0, j))
        out = pl.pallas_call(
            functools.partial(kernel, kdims),
            grid=(1, Bp // bt),
            in_specs=_sample_specs(
                kdims, P, x_spec, pre_spec,
                packed="transposed" if pk else None,
            ),
            out_specs=pl.BlockSpec((1, 2, bt), lambda j, i: (j, 0, i)),
            out_shape=jax.ShapeDtypeStruct((1, 2, Bp), jnp.float32),
            interpret=interpret,
        )(x, *inputs)
        return out[0].T  # (Bp, 2)
    bt_wide = _sample_bt()
    # The bucketer sizes _GT for the EXACT kernel's (smaller) batch tile;
    # this kernel's live (bt, Gt) f32 intermediates must fit VMEM too.
    # Low-parity-count circuits get wide graph tiles (gt_fit ~ 1/t_par),
    # so shrink the batch tile until bt * Gt is safe (~a dozen live f32
    # planes + Mosaic double buffering inside the 16 MiB scoped limit).
    # Bp is a multiple of _sample_bt(), so every halving still divides it.
    plane_cap = int(os.environ.get("TSIM_TPU_SAMPLE_PLANE", 1 << 17))
    while bt_wide > 128 and bt_wide * _GT > plane_cap:
        bt_wide //= 2
    if _use_tpack():
        # The packed kernel materializes one (bt, T*Gt) f32 parity plane
        # per family (two live at once for the psi/phi and alpha/beta
        # pairs), so high-term buckets must also shrink the batch tile or
        # the pallas_call exceeds Mosaic's scoped VMEM (the failure mode
        # that killed the naive batched form this kernel replaced).
        t_big = max(T1, T2, 2 * T3, 2 * T4, 1)
        pack_cap = int(os.environ.get("TSIM_TPU_SAMPLE_PACK_PLANE", 1 << 21))
        while bt_wide > 128 and bt_wide * _GT * t_big > pack_cap:
            bt_wide //= 2
    n_bt, n_gt = Bp // bt_wide, Gp // _GT
    x_spec = pl.BlockSpec((bt_wide, P), lambda j, i: (i, 0))
    pre_spec = pl.BlockSpec((2, _GT), lambda j, i: (0, j))
    pk = _use_tpack()
    kernel = _kernel_sample if pk else _kernel_sample_unpacked
    out = pl.pallas_call(
        functools.partial(kernel, kdims),
        grid=(n_gt, n_bt),
        in_specs=_sample_specs(
            kdims, P, x_spec, pre_spec, packed="wide" if pk else None
        ),
        out_specs=pl.BlockSpec((1, bt_wide, 2), lambda j, i: (j, i, 0)),
        out_shape=jax.ShapeDtypeStruct((n_gt, Bp, 2), jnp.float32),
        interpret=interpret,
    )(x, *inputs)
    return jnp.sum(out, axis=0)  # (Bp, 2)


def evaluate_abs_sample_f32(
    circuit: CompiledScalarGraphs, param_vals: Array
) -> Array:
    """|amplitude| per batch row via the f32 sampling kernel."""
    B, P_in = param_vals.shape
    P = max(P_in, 8)
    if circuit.num_graphs < _small_g_cutoff():
        gt, bt = _small_sample_tiles()
        Bp = max(bt, ((B + bt - 1) // bt) * bt)
        x = _pad_to(_pad_to(param_vals.astype(jnp.uint8), P, 1), Bp, 0).T
    else:
        bt = _sample_bt()
        Bp = max(bt, ((B + bt - 1) // bt) * bt)
        x = _pad_to(_pad_to(param_vals.astype(jnp.uint8), P, 1), Bp, 0)

    total = None
    buckets, bias = _prepared_sample_buckets(circuit, P)
    for tables, dims in buckets:
        out = _run_sample_bucket(tables, dims, x, Bp, P)
        total = out if total is None else total + out
    mag = jnp.sqrt(total[:, 0] ** 2 + total[:, 1] ** 2)
    if bias:
        # Two-step rescale: each half stays a normal f32 (|bias| <= 200
        # guaranteed by sample_eligible).
        h = bias // 2
        mag = mag * np.float32(2.0 ** h) * np.float32(2.0 ** (bias - h))
    return mag[:B]


# Mode knob: "f32" forces the sampling kernel everywhere (tests use this
# with interpret mode), "exact" forces the exact path, unset = f32 on TPU.
_SAMPLE_MODE = os.environ.get("TSIM_TPU_SAMPLE_EVAL", "").strip()


def _use_f32_sampling() -> bool:
    if _SAMPLE_MODE == "exact":
        return False
    if _SAMPLE_MODE == "f32":
        return True
    return _use_fused() and jax.default_backend() == "tpu"


def norm_deviation_tolerance() -> float:
    """Warn threshold for the sampler's marginal-normalization monitor.

    The exact path deviates only by the final float conversion (~1e-7);
    f32 products accumulate ~T * 2^-23 relative error plus cancellation
    in the graph sum, so the monitor gets a wider (still tight) band.
    """
    return 3e-3 if _use_f32_sampling() else 1e-5


def evaluate_abs_sample(circuit: CompiledScalarGraphs, param_vals: Array) -> Array:
    """Sampling-mode dispatch: f32 kernel when eligible, exact otherwise."""
    if circuit.num_graphs == 0:
        return _evaluate_abs_xla(circuit, param_vals)
    if _use_f32_sampling() and sample_eligible(circuit):
        return _anchor(
            evaluate_abs_sample_f32(circuit, param_vals), param_vals
        )
    from .pallas_evaluate import evaluate_abs_auto

    return evaluate_abs_auto(circuit, param_vals)
