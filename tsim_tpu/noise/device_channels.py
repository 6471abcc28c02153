"""On-device noise-channel sampling (gather-free, MXU-friendly).

The host geometric-skip sampler (``channels.ChannelSampler``) is ideal on
CPU; on TPU the h2d of per-batch noise configurations costs a tunnel round
trip per batch. This module compiles the simplified channels into padded
CDF tensors plus a stacked signature matrix and draws f-configurations
inside jit:

    outcome_c = sum_j [u_c > cdf_c[j]]           (comparisons, no gather)
    f = (outcome_bits . S) mod 2                 (one MXU matmul)

where ``outcome_bits`` lays the binary digits of every channel's outcome
index along one K = sum_c k_c axis and ``S`` stacks the matching
``signature_matrix`` rows: each channel's XOR pattern is
``bits(outcome) @ sig[ids]``, so the per-channel pattern table never needs
to be one-hot-selected — the (B, C, O) one-hot intermediate (the dominant
HBM traffic of the old formulation) disappears entirely.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from .channels import ChannelSampler


class DeviceChannelSampler:
    """Device-side sampler over the same simplified channels."""

    def __init__(self, channel_sampler: ChannelSampler):
        channels = channel_sampler.channels
        sig = channel_sampler.signature_matrix  # (num_sigs, num_f)
        self.num_f = sig.shape[1]
        live = [ch for ch in channels if 1.0 - float(ch.probs[0]) > 1e-15]
        self.num_channels = len(live)
        self.peak_bytes_per_shot = 0
        if not live:
            return
        # Channels sorted by outcome count: the CDF compare-reduce then runs
        # per same-width bucket instead of padding every channel to the
        # global maximum (a DEPOLARIZE2's 16 outcomes).
        live.sort(key=lambda ch: len(ch.probs))
        C = len(live)
        self.max_k = max(len(ch.unique_col_ids) for ch in live)
        # buckets: contiguous [start, end) channel ranges sharing O.
        self.buckets: list[tuple[int, int, int]] = []
        cdfs: list[np.ndarray] = []
        for ci, ch in enumerate(live):
            o = len(ch.probs)
            if not self.buckets or self.buckets[-1][2] != o:
                self.buckets.append((ci, ci + 1, o))
            else:
                s, _, _ = self.buckets[-1]
                self.buckets[-1] = (s, ci + 1, o)
            cdfs.append(np.cumsum(ch.probs.astype(np.float64)))
        self.cdf_list = [
            np.stack([cdfs[c] for c in range(s, e)]).astype(np.float32)
            for (s, e, _) in self.buckets
        ]
        # S_cat[(j, c), f] = sig[ids_c[j]] (zero when channel c has < j+1
        # bits): outcome-bitplane j of channel c XORs this row into f.
        s_cat = np.zeros((self.max_k, C, self.num_f), np.uint8)
        for ci, ch in enumerate(live):
            ids = np.asarray(ch.unique_col_ids)
            for j in range(len(ids)):
                s_cat[j, ci] = sig[ids[j]]
        self.sig_cat = s_cat.reshape(self.max_k * C, self.num_f)
        # Narrow-F fast path: all f bits of one outcome pack into a single
        # int32 word, and the whole sampler reduces to bracket-select-XOR
        # folds with (B, Cb) working set (no (B, C, O) or (B, K)
        # intermediates). words[bucket][o][c] = packed pattern.
        self.packed = self.num_f <= 31
        if self.packed:
            weights = (1 << np.arange(self.num_f)).astype(np.int64)
            self.word_list = []
            for (s, e, o) in self.buckets:
                w = np.zeros((o, e - s), np.int32)
                for ci in range(s, e):
                    ch = live[ci]
                    ids = np.asarray(ch.unique_col_ids)
                    k = len(ids)
                    outs = np.arange(len(ch.probs))
                    bits = ((outs[:, None] >> np.arange(k)) & 1).astype(np.uint8)
                    pat = bits @ sig[ids] % 2  # (O, F)
                    w[:, ci - s] = (pat.astype(np.int64) @ weights).astype(
                        np.int32
                    )
                self.word_list.append(w)
        # Rough working-set bound per shot for batch-size estimation:
        # packed path keeps (B, C) uniforms + a few (B, Cb) temporaries;
        # bitplane path materializes (B, max_k * C) planes in int32 + bf16.
        if self.packed:
            self.peak_bytes_per_shot = 16 * C
        else:
            self.peak_bytes_per_shot = 8 * self.max_k * C + 4 * self.num_f
        self._put_device()

    def _put_device(self):
        # device_put once: embedding these as jit literals bloats the
        # lowered program (MBs of constants for surface-code-sized channel
        # sets) past remote-compile request limits.
        self._cdf_dev = [jax.device_put(c) for c in self.cdf_list]
        # bf16 keeps the parity matmul on the MXU fast path; the counts it
        # accumulates are exact (f32 accumulation, row sums < 2^24).
        self._sig_dev = jax.device_put(self.sig_cat.astype(jnp.bfloat16))
        if self.packed:
            self._word_dev = [jax.device_put(w) for w in self.word_list]

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_cdf_dev", None)
        state.pop("_sig_dev", None)
        state.pop("_word_dev", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        if self.num_channels:
            self._put_device()

    def sample(self, key: jax.Array, batch: int) -> jax.Array:
        """Draw (batch, num_f) uint8 noise configurations (traceable)."""
        if self.num_channels == 0:
            return jnp.zeros((batch, self.num_f), jnp.uint8)
        C = sum(e - s for (s, e, _) in self.buckets)
        u = jax.random.uniform(key, (batch, C), dtype=jnp.float32)
        if self.packed:
            # Fold packed pattern words under the CDF brackets:
            # acc ^= XOR_c [cdf_{o-1} <= u_c < cdf_o] * words[o][c].
            acc = jnp.zeros((batch, 1), jnp.int32)
            for (s, e, o), cdf_dev, w_dev, w_np in zip(
                self.buckets, self._cdf_dev, self._word_dev, self.word_list
            ):
                ub = u[:, s:e]
                ge_prev = jnp.ones_like(ub, dtype=bool)
                for oi in range(o):
                    ge = ub >= cdf_dev[None, :, oi]
                    # outcome 0 always packs to word 0; skip dead selects.
                    if w_np[oi].any():
                        bracket = ge_prev & ~ge
                        contrib = jnp.where(bracket, w_dev[oi][None, :], 0)
                        acc = acc ^ lax.reduce(
                            contrib, np.int32(0), lax.bitwise_xor, [1]
                        ).reshape(batch, 1)
                    ge_prev = ge
            bit = jnp.arange(self.num_f, dtype=jnp.int32)
            return ((acc >> bit[None, :]) & 1).astype(jnp.uint8)
        # Outcome index per channel via CDF bracketing; each bucket's
        # (B, Cb, Ob) comparison fuses into a (B, Cb) reduction.
        idx = jnp.concatenate(
            [
                jnp.sum(
                    u[:, s:e, None] >= cdf_dev[None, :, :],
                    axis=2,
                    dtype=jnp.int32,
                )
                for (s, e, _), cdf_dev in zip(self.buckets, self._cdf_dev)
            ],
            axis=1,
        )
        # Outcome bitplanes laid out (j, c) along one axis, then one MXU
        # parity matmul against the stacked signature rows — no per-bit
        # gather and no (B, C, O) one-hot intermediate.
        shifts = jnp.arange(self.max_k, dtype=jnp.int32)
        planes = (idx[:, None, :] >> shifts[None, :, None]) & 1  # (B, k, C)
        x = planes.reshape(batch, self.max_k * C).astype(jnp.bfloat16)
        counts = jax.lax.dot_general(
            x,
            self._sig_dev,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (B, F)
        return (counts.astype(jnp.int32) & 1).astype(jnp.uint8)
