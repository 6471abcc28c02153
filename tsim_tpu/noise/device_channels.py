"""On-device noise-channel sampling (gather-free, MXU-friendly).

The host geometric-skip sampler (``channels.ChannelSampler``) is ideal on
CPU; on TPU the h2d of per-batch noise configurations costs a tunnel round
trip per batch. This module compiles the simplified channels into padded
CDF + XOR-pattern tensors and draws f-configurations inside jit:

    outcome_c = sum_j [u_c > cdf_c[j]]           (comparisons, no gather)
    f = (onehot(outcome) . patterns) mod 2       (one MXU matmul)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .channels import ChannelSampler


class DeviceChannelSampler:
    """Device-side sampler over the same simplified channels."""

    def __init__(self, channel_sampler: ChannelSampler):
        channels = channel_sampler.channels
        sig = channel_sampler.signature_matrix  # (num_sigs, num_f)
        self.num_f = sig.shape[1]
        live = [ch for ch in channels if 1.0 - float(ch.probs[0]) > 1e-15]
        self.num_channels = len(live)
        if not live:
            self.cdf = np.zeros((0, 1), np.float32)
            self.patterns = np.zeros((0, 1, max(self.num_f, 1)), np.uint8)
            return
        max_o = max(len(ch.probs) for ch in live)
        C = len(live)
        cdf = np.ones((C, max_o), np.float32)
        patterns = np.zeros((C, max_o, self.num_f), np.uint8)
        for ci, ch in enumerate(live):
            probs = ch.probs.astype(np.float64)
            cum = np.cumsum(probs)
            cdf[ci, : len(probs)] = cum
            cdf[ci, len(probs):] = 1.0
            ids = np.asarray(ch.unique_col_ids)
            k = len(ids)
            outcomes = np.arange(len(probs))
            bits = ((outcomes[:, None] >> np.arange(k)) & 1).astype(np.uint8)
            patterns[ci, : len(probs)] = bits @ sig[ids] % 2
        self.cdf = cdf
        self.patterns = patterns
        # device_put once: embedding these as jit literals bloats the
        # lowered program (MBs of constants for surface-code-sized channel
        # sets) past remote-compile request limits.
        self._cdf_dev = jax.device_put(cdf)
        self._pat_dev = jax.device_put(
            patterns.reshape(len(live) * max_o, self.num_f).astype(np.float32)
        )

    def __getstate__(self):
        state = dict(self.__dict__)
        state.pop("_cdf_dev", None)
        state.pop("_pat_dev", None)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        if self.num_channels:
            C, O = self.cdf.shape
            self._cdf_dev = jax.device_put(self.cdf)
            self._pat_dev = jax.device_put(
                self.patterns.reshape(C * O, self.num_f).astype(np.float32)
            )

    def sample(self, key: jax.Array, batch: int) -> jax.Array:
        """Draw (batch, num_f) uint8 noise configurations (traceable)."""
        if self.num_channels == 0:
            return jnp.zeros((batch, self.num_f), jnp.uint8)
        C, O = self.cdf.shape
        u = jax.random.uniform(key, (batch, C), dtype=jnp.float32)
        # outcome one-hot via CDF bracketing: onehot[b,c,j] = 1 iff
        # cdf[j-1] <= u < cdf[j].
        below = u[:, :, None] < self._cdf_dev[None, :, :]
        prev = jnp.concatenate(
            [jnp.zeros((batch, C, 1), bool), below[:, :, :-1]], axis=2
        )
        onehot = (below & ~prev).astype(jnp.float32)  # (B, C, O)
        counts = onehot.reshape(batch, C * O) @ self._pat_dev  # (B, F)
        return (counts % 2).astype(jnp.uint8)
