"""Mesh-sharded sampling through the public sampler API.

Runs on the 8-virtual-device CPU mesh from conftest. Mirrors the
single-device sampler semantics: correct statistics, uniform batch
handling, reproducibility for a fixed seed + batch size.
"""

import jax
import numpy as np
import pytest

from tsim_tpu.circuit import Circuit
from tsim_tpu.parallel.shard import make_shot_mesh

CIRCUIT = """
H 0
T 0
CNOT 0 1
X_ERROR(0.25) 0
DEPOLARIZE1(0.05) 1
M 0 1
DETECTOR rec[-1] rec[-2]
OBSERVABLE_INCLUDE(0) rec[-1]
"""


@pytest.fixture(scope="module")
def mesh():
    if jax.device_count() < 2:
        pytest.skip("needs a multi-device backend")
    return make_shot_mesh()


def test_sharded_detector_statistics(mesh):
    c = Circuit(CIRCUIT)
    sharded = c.compile_detector_sampler(seed=3, mesh=mesh)
    assert sharded._mesh is mesh
    det = sharded.sample(8000, batch_size=4000)
    base = c.compile_detector_sampler(seed=4, mesh=None).sample(
        8000, batch_size=4000
    )
    assert det.shape == base.shape
    # 4-sigma binomial agreement per column.
    for j in range(det.shape[1]):
        p = base[:, j].mean()
        sigma = np.sqrt(max(p * (1 - p), 1e-4) / 8000)
        assert abs(det[:, j].mean() - p) < 4 * sigma + 1e-3


def test_sharded_batch_rounding(mesh):
    # batch_size not divisible by the mesh size is rounded up internally;
    # the result still has exactly `shots` rows.
    c = Circuit(CIRCUIT)
    s = c.compile_detector_sampler(seed=5, mesh=mesh)
    det = s.sample(1001, batch_size=501)
    assert det.shape[0] == 1001


def test_sharded_deterministic(mesh):
    c = Circuit(CIRCUIT)
    a = c.compile_detector_sampler(seed=11, mesh=mesh).sample(512, batch_size=256)
    b = c.compile_detector_sampler(seed=11, mesh=mesh).sample(512, batch_size=256)
    assert np.array_equal(a, b)


def test_mesh_auto_is_none_on_cpu():
    # conftest forces the cpu backend: "auto" must resolve to unsharded.
    c = Circuit(CIRCUIT)
    s = c.compile_detector_sampler(seed=0)
    assert s._mesh is None


def test_measurement_sampler_sharded(mesh):
    c = Circuit("H 0\nT 0\nX_ERROR(0.3) 0\nM 0")
    m = c.compile_sampler(seed=2, mesh=mesh).sample(4096, batch_size=1024)
    assert m.shape == (4096, 1)
    # P(1) = 0.5*0.7 + 0.5*0.3 = 0.5 (X flips the |+> measurement in Z? no:
    # on |T> state P(m=1)=0.5; the X error commutes the rate to 0.5 too).
    assert abs(m.mean() - 0.5) < 0.05


def test_state_probs_sharded_matches_unsharded(mesh):
    # The batch-sharded estimator must agree with the unsharded body on the
    # same f-sample stream (identical seed => identical channel samples).
    c = Circuit(CIRCUIT)
    sharded = c.compile_state_probs(seed=21, mesh=mesh)
    assert sharded._mesh is mesh
    base = c.compile_state_probs(seed=21, mesh=None)
    state = np.zeros(sharded._program.num_outputs, dtype=np.uint8)
    p_sharded = sharded.probability_of(state, batch_size=64)
    p_base = base.probability_of(state, batch_size=64)
    np.testing.assert_allclose(p_sharded, p_base, rtol=1e-6, atol=1e-9)
    assert ((p_sharded >= 0) & (p_sharded <= 1 + 1e-9)).all()


def test_state_probs_sharded_indivisible_batch_falls_back(mesh):
    # batch not divisible by the mesh size: runs unsharded, same results.
    c = Circuit(CIRCUIT)
    sharded = c.compile_state_probs(seed=22, mesh=mesh)
    state = np.zeros(sharded._program.num_outputs, dtype=np.uint8)
    p = sharded.probability_of(state, batch_size=33)
    assert p.shape == (33,)
    assert np.isfinite(p).all()
