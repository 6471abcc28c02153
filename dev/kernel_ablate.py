"""Ablate the f32 sampling kernel stage by stage on a checkpointed rung.

Times kernel variants that run only a subset of the stages (parities,
T1 loop, T2, T3, T4, prefold+sum) to apportion the wall time of the
wide-ladder hot kernel. Uses rung r_idx of the heavy component of
/tmp/cult2_sampler.ckpt.

    python dev/kernel_ablate.py [rung_idx] [batch_log2]
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

from tsim_tpu.compile import pallas_sample as ps
from tsim_tpu.compile.pallas_evaluate import _pad_to, _tiles


def _body_ablate(dims, parts, *refs):
    (
        x_ref,
        np_cos_ref, np_sin_ref, np_params_ref, np_counts_ref,
        hp_coeffs_ref, hp_params_ref,
        pp_psi_c_ref, pp_psi_p_ref, pp_phi_c_ref, pp_phi_p_ref,
        qp_ca_ref, qp_sa_ref, qp_cb_ref, qp_sb_ref, qp_cg_ref, qp_sg_ref,
        qp_alpha_p_ref, qp_beta_p_ref, qp_counts_ref,
        pre_ref, out_ref,
    ) = refs
    T1, T2, T3, T4, Gt = dims
    x = x_ref[...].astype(jnp.int32).astype(ps._PARITY_DTYPE)
    shape = (x.shape[0], Gt)
    re = jnp.ones(shape, jnp.float32)
    im = jnp.zeros(shape, jnp.float32)

    if "p1" in parts and T1:
        par = ps._parity_f32(np_params_ref, x, T1, Gt, False)
        if "t1" in parts:
            counts = np_counts_ref[0][None, :]
            cos_t = np_cos_ref[...]
            sin_t = np_sin_ref[...]
            for t in range(T1):
                sigma = 1.0 - 2.0 * par[:, t, :]
                fr = 1.0 + sigma * cos_t[t][None, :]
                fi = sigma * sin_t[t][None, :]
                nre = re * fr - im * fi
                nim = re * fi + im * fr
                live = t < counts
                re = jnp.where(live, nre, re)
                im = jnp.where(live, nim, im)
        else:
            re = re + par[:, 0, :]

    if "p2" in parts and T2:
        par = ps._parity_f32(hp_params_ref, x, T2, Gt, False)
        if "t2" in parts:
            coeffs = hp_coeffs_ref[...]
            total = jnp.zeros(shape, jnp.float32)
            for t in range(T2):
                total = total + coeffs[t][None, :].astype(jnp.float32) * par[:, t, :]
            re, im = ps._rot_staged(re, im, total.astype(jnp.int32) & 7)
        else:
            re = re + par[:, 0, :]

    if "p3" in parts and T3:
        par_psi = ps._parity_f32(pp_psi_p_ref, x, T3, Gt, False)
        par_phi = ps._parity_f32(pp_phi_p_ref, x, T3, Gt, False)
        if "t3" in parts:
            psi_c = pp_psi_c_ref[...].astype(jnp.float32)
            phi_c = pp_phi_c_ref[...].astype(jnp.float32)
            expo = jnp.zeros(shape, jnp.float32)
            for t in range(T3):
                psi = psi_c[t][None, :] + (1.0 - 2.0 * psi_c[t][None, :]) * par_psi[:, t, :]
                phi = phi_c[t][None, :] + (1.0 - 2.0 * phi_c[t][None, :]) * par_phi[:, t, :]
                prod = psi * phi
                expo = expo + prod - 2.0 * expo * prod
            sign = 1.0 - 2.0 * expo
            re = re * sign
            im = im * sign
        else:
            re = re + par_psi[:, 0, :] + par_phi[:, 0, :]

    if "p4" in parts and T4:
        par_a = ps._parity_f32(qp_alpha_p_ref, x, T4, Gt, False)
        par_b = ps._parity_f32(qp_beta_p_ref, x, T4, Gt, False)
        if "t4" in parts:
            ca, sa = qp_ca_ref[...], qp_sa_ref[...]
            cb, sb = qp_cb_ref[...], qp_sb_ref[...]
            cg, sg = qp_cg_ref[...], qp_sg_ref[...]
            counts = qp_counts_ref[0][None, :]
            for t in range(T4):
                s_a = 1.0 - 2.0 * par_a[:, t, :]
                s_b = 1.0 - 2.0 * par_b[:, t, :]
                s_g = s_a * s_b
                fr = 1.0 + s_a * ca[t][None, :] + s_b * cb[t][None, :] - s_g * cg[t][None, :]
                fi = s_a * sa[t][None, :] + s_b * sb[t][None, :] - s_g * sg[t][None, :]
                nre = re * fr - im * fi
                nim = re * fi + im * fr
                live = t < counts
                re = jnp.where(live, nre, re)
                im = jnp.where(live, nim, im)
        else:
            re = re + par_a[:, 0, :] + par_b[:, 0, :]

    pr = pre_ref[0][None, :]
    pi_ = pre_ref[1][None, :]
    fre = re * pr - im * pi_
    fim = re * pi_ + im * pr
    out_ref[...] = jnp.stack(
        [jnp.sum(fre, axis=1), jnp.sum(fim, axis=1)], axis=1
    )[None]


def run_variant(rung, x, Bp, P, parts):
    total = None
    for tables, dims in ps._prepared_sample_buckets(rung, P)[0]:
        T1, T2, T3, T4, _GT, Gp, bt = dims
        kdims = (T1, T2, T3, T4, _GT)
        inputs = [tables[k] for k in ps._TABLE_KEYS]
        n_bt, n_gt = Bp // bt, Gp // _GT
        x_spec = pl.BlockSpec((bt, P), lambda j, i: (i, 0))
        pre_spec = pl.BlockSpec((2, _GT), lambda j, i: (0, j))
        out = pl.pallas_call(
            functools.partial(_body_ablate, kdims, parts),
            grid=(n_gt, n_bt),
            in_specs=ps._sample_specs(kdims, P, x_spec, pre_spec),
            out_specs=pl.BlockSpec((1, bt, 2), lambda j, i: (j, i, 0)),
            out_shape=jax.ShapeDtypeStruct((n_gt, Bp, 2), jnp.float32),
        )(x, *inputs)
        out = jnp.sum(out, axis=0)
        total = out if total is None else total + out
    return jnp.sqrt(total[:, 0] ** 2 + total[:, 1] ** 2)


def main():
    from tsim_tpu.sampler import CompiledDetectorSampler

    r_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    B = 1 << (int(sys.argv[2]) if len(sys.argv) > 2 else 17)
    smp = CompiledDetectorSampler.load("/tmp/cult2_sampler.ckpt")
    rung = smp._program.components[0].compiled_scalar_graphs[r_idx]
    P = max(rung.n_params, 8)
    bt = _tiles()[0]
    Bp = ((B + bt - 1) // bt) * bt
    x = jax.device_put(
        _pad_to(
            _pad_to(
                np.random.default_rng(0)
                .integers(0, 2, size=(B, rung.n_params))
                .astype(np.uint8),
                P,
                1,
            ),
            Bp,
            0,
        )
    )

    variants = [
        ("empty", frozenset()),
        ("par1", frozenset({"p1"})),
        ("par-all", frozenset({"p1", "p2", "p3", "p4"})),
        ("par1+T1", frozenset({"p1", "t1"})),
        ("par+T1..T3", frozenset({"p1", "t1", "p2", "t2", "p3", "t3"})),
        ("full", frozenset({"p1", "t1", "p2", "t2", "p3", "t3", "p4", "t4"})),
    ]
    for name, parts in variants:
        fn = jax.jit(lambda v, pp=parts: run_variant(rung, v, Bp, P, pp))
        out = fn(x)
        _ = np.asarray(out[:1])
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            out = fn(x)
            _ = np.asarray(out[:1])
            best = min(best, time.perf_counter() - t0)
        print(f"{name:12s}: {best*1e3:7.1f} ms", flush=True)


if __name__ == "__main__":
    main()
