"""End-to-end QEC: sample, decode, compare logical error rates across engines.

Semantic spec: reference ``test/integration/test_sampler.py:161-257`` (the
pymatching decode comparison and the d=5 r=5 detector-fraction agreement).
The reference decodes with pymatching; this repo ships an in-house exact
min-weight matcher (bitmask-DP perfect matching over Dijkstra-style
all-pairs shortest paths on the DEM graph), which is all the test needs:
both engines' samples are decoded with the SAME decoder, so agreement of
the logical error rates is engine-level evidence, not decoder-level.
"""

import math

import numpy as np
import pytest

from tsim_tpu.models.surface_code import rotated_surface_code_memory_z
from tsim_tpu.stim_core.native_frame import NativeFrameSampler


class DemMatcher:
    """Min-weight perfect matching decoder over a DEM's detector graph.

    Mechanisms touching 1 detector become boundary edges; 2 detectors,
    internal edges; hyperedges (3+, undecomposed Y-type mechanisms) are
    dropped — fine here because every sample stream is decoded by the
    same graph.
    """

    def __init__(self, dem):
        n = dem.num_detectors
        self.n = n
        self.boundary = n
        size = n + 1

        mechanisms = []
        for instr in dem:
            if instr.type != "error":
                continue
            p = instr.args_copy()[0]
            if p <= 0 or p >= 1:
                continue
            dets = []
            ob = 0
            for t in instr.targets_copy():
                if t.is_relative_detector_id():
                    dets.append(t.val)
                elif t.is_logical_observable_id():
                    ob ^= 1
            mechanisms.append((sorted(dets), ob, p))

        # pass 1: graphlike mechanisms become edges; parallel edges combine
        # probabilities when the observable parity agrees, else keep the
        # heavier (more likely) edge's parity.
        edge_p: dict[tuple[int, int], float] = {}
        edge_obs: dict[tuple[int, int], int] = {}

        def add_edge(u, v, p, ob):
            key = (min(u, v), max(u, v))
            if key not in edge_p:
                edge_p[key] = p
                edge_obs[key] = ob
                return
            if edge_obs[key] == ob:
                q = edge_p[key]
                edge_p[key] = q * (1 - p) + p * (1 - q)
            elif p > edge_p[key]:
                edge_p[key] = p
                edge_obs[key] = ob

        hyper = []
        for dets, ob, p in mechanisms:
            if len(dets) == 1:
                add_edge(dets[0], self.boundary, p, ob)
            elif len(dets) == 2:
                add_edge(dets[0], dets[1], p, ob)
            elif len(dets) > 2:
                hyper.append((dets, ob, p))

        # pass 2: decompose hyperedges into existing graphlike pieces whose
        # observable parities XOR to the hyperedge's (stim decompose_errors
        # semantics, restricted to already-present edges).
        def partitions(items):
            if not items:
                yield []
                return
            a, rest = items[0], items[1:]
            # a alone (boundary piece)
            for tail in partitions(rest):
                yield [(a,)] + tail
            for i, b in enumerate(rest):
                for tail in partitions(rest[:i] + rest[i + 1 :]):
                    yield [(a, b)] + tail

        for dets, ob, p in hyper:
            for part in partitions(dets):
                keys = []
                par = 0
                okpart = True
                for piece in part:
                    if len(piece) == 1:
                        key = (piece[0], self.boundary)
                    else:
                        key = (min(piece), max(piece))
                    if key not in edge_p:
                        okpart = False
                        break
                    keys.append(key)
                    par ^= edge_obs[key]
                if okpart and par == ob:
                    for key in keys:
                        q = edge_p[key]
                        edge_p[key] = q * (1 - p) + p * (1 - q)
                    break

        INF = float("inf")
        dist = np.full((size, size), INF)
        np.fill_diagonal(dist, 0.0)
        obs = np.zeros((size, size), dtype=np.uint8)
        for (u, v), p in edge_p.items():
            dist[u, v] = dist[v, u] = -math.log(p / (1 - p))
            obs[u, v] = obs[v, u] = edge_obs[(u, v)]
        self.edge_obs = dict(edge_obs)
        # all-pairs shortest paths, tracking observable parity along paths
        for k in range(size):
            via = dist[:, k, None] + dist[None, k, :]
            better = via < dist
            obs_new = obs[:, k, None] ^ obs[None, k, :]
            dist = np.where(better, via, dist)
            obs = np.where(better, obs_new, obs)
        self.dist = dist
        self.obs = obs

    def decode(self, syndrome: np.ndarray) -> int:
        """Predicted observable flip for one detector bit-vector."""
        defects = list(np.flatnonzero(syndrome))
        if len(defects) % 2:
            defects.append(self.boundary)
        if not defects:
            return 0
        if len(defects) > 16:  # pathological shot; greedy fallback
            return self._greedy(defects)
        m = len(defects)
        full = (1 << m) - 1
        memo = {0: (0.0, 0)}

        def solve(mask):
            if mask in memo:
                return memo[mask]
            i = (mask & -mask).bit_length() - 1
            rest = mask & ~(1 << i)
            best = (float("inf"), 0)
            jbits = rest
            while jbits:
                j = (jbits & -jbits).bit_length() - 1
                jbits &= jbits - 1
                w, o = solve(rest & ~(1 << j))
                w2 = w + self.dist[defects[i], defects[j]]
                if w2 < best[0]:
                    best = (w2, o ^ self.obs[defects[i], defects[j]])
            memo[mask] = best
            return best

        return solve(full)[1]

    def _greedy(self, defects):
        out = 0
        left = defects[:]
        while left:
            a = left.pop()
            j = min(range(len(left)), key=lambda j: self.dist[a, left[j]])
            b = left.pop(j)
            out ^= self.obs[a, b]
        return out


def _noisy_d3() -> "Circuit":
    return rotated_surface_code_memory_z(
        3,
        3,
        after_clifford_depolarization=0.01,
        before_round_data_depolarization=0.01,
        before_measure_flip_probability=0.01,
        after_reset_flip_probability=0.01,
    )


def test_decoded_logical_error_rate_agreement():
    """ZX-pipeline sampler and native frame sampler, decoded by the same
    matcher, must produce statistically identical logical error rates."""
    circuit = _noisy_d3()
    matcher = DemMatcher(circuit.detector_error_model())
    shots = 4000

    det_a, obs_a = circuit.compile_detector_sampler(seed=5).sample(
        shots, separate_observables=True
    )
    native = NativeFrameSampler(circuit.stim_circuit, seed=6)
    _, det_b, obs_b = native.sample(shots, include_measurements=False)

    def ler(det, obs):
        wrong = 0
        for i in range(shots):
            wrong += int(matcher.decode(det[i])) ^ int(obs[i, 0])
        return wrong / shots

    rate_a = ler(det_a, obs_a)
    rate_b = ler(det_b, obs_b)
    # decoding must beat raw observable readout by a wide margin
    assert rate_a < 0.5 * max(obs_a.mean(), 1e-9) + 0.01
    sigma = math.sqrt(2 * max(rate_b, 1e-3) * (1 - rate_b) / shots)
    assert abs(rate_a - rate_b) < 5 * sigma + 0.005, (rate_a, rate_b)


def test_decoder_corrects_injected_single_errors():
    """Injecting one graph edge's syndrome must decode to that edge's
    observable parity (exactness check on the matcher itself). Parallel
    DEM mechanisms fold into one edge, so the edge table is the spec."""
    circuit = _noisy_d3()
    dem = circuit.detector_error_model()
    matcher = DemMatcher(dem)
    n = dem.num_detectors
    checked = 0
    for (u, v), ob in matcher.edge_obs.items():
        syndrome = np.zeros(n, dtype=bool)
        for d in (u, v):
            if d != matcher.boundary:
                syndrome[d] = True
        assert matcher.decode(syndrome) == ob, (u, v, ob)
        checked += 1
    assert checked > 20


def test_d5_r5_detector_fraction_agreement():
    """d=5 r=5, 200k shots per engine: per-detector fire fractions must
    agree within 0.5% absolute (reference integration bar)."""
    circuit = rotated_surface_code_memory_z(
        5,
        5,
        after_clifford_depolarization=0.005,
        before_round_data_depolarization=0.005,
        before_measure_flip_probability=0.005,
        after_reset_flip_probability=0.005,
    )
    shots = 200_000
    det_a = circuit.compile_detector_sampler(seed=11).sample(
        shots, batch_size=50_000
    )
    native = NativeFrameSampler(circuit.stim_circuit, seed=12)
    _, det_b, _ = native.sample(shots, include_measurements=False)

    frac_a = det_a.mean(axis=0)
    frac_b = det_b.mean(axis=0)
    assert det_a.shape == det_b.shape
    assert np.abs(frac_a - frac_b).max() < 0.005


def test_d5_pauli_channel_noise_model_agreement():
    """BASELINE.md workload-2 noise model (PAULI_CHANNEL_1 on data each
    round, PAULI_CHANNEL_2 after each CX): ZX detector sampler vs the
    native Pauli-frame engine, per-detector fractions within 0.5%."""
    p = 0.004
    circuit = rotated_surface_code_memory_z(
        5,
        3,
        pauli_channel_1=(p, p / 2, p / 2),
        pauli_channel_2=tuple([p / 15] * 15),
        before_measure_flip_probability=p,
    )
    shots = 60_000
    det_a = circuit.compile_detector_sampler(seed=5).sample(
        shots, batch_size=30_000
    )
    native = NativeFrameSampler(circuit.stim_circuit, seed=6)
    _, det_b, _ = native.sample(shots, include_measurements=False)
    frac_a = det_a.mean(axis=0)
    frac_b = det_b.mean(axis=0)
    assert det_a.shape == det_b.shape
    assert np.abs(frac_a - frac_b).max() < 0.005
