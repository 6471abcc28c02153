"""Compiled-sampler checkpointing: save/load without recompiling."""

import numpy as np

import tsim_tpu
from tsim_tpu.sampler import CompiledDetectorSampler, CompiledMeasurementSampler

TEXT = """
H 0
T 0
CNOT 0 1
X_ERROR(0.2) 0
DEPOLARIZE1(0.1) 1
M 0 1
DETECTOR rec[-1] rec[-2]
OBSERVABLE_INCLUDE(0) rec[-1]
"""


def test_detector_sampler_roundtrip(tmp_path):
    path = tmp_path / "sampler.ckpt"
    a = tsim_tpu.Circuit(TEXT).compile_detector_sampler(seed=5)
    a.save(path)
    b = CompiledDetectorSampler.load(path)
    # Both continue the identical sample stream.
    sa = a.sample(500, batch_size=500)
    sb = b.sample(500, batch_size=500)
    np.testing.assert_array_equal(sa, sb)
    # And keep agreeing on the next call (RNG state advanced identically).
    np.testing.assert_array_equal(
        a.sample(100, batch_size=100), b.sample(100, batch_size=100)
    )


def test_measurement_sampler_roundtrip(tmp_path):
    path = tmp_path / "m.ckpt"
    a = tsim_tpu.Circuit("H 0\nT 0\nM 0").compile_sampler(seed=7)
    a.save(path)
    b = CompiledMeasurementSampler.load(path)
    np.testing.assert_array_equal(
        a.sample(200, batch_size=200), b.sample(200, batch_size=200)
    )


def test_wrong_class_raises(tmp_path):
    import pytest

    path = tmp_path / "m.ckpt"
    tsim_tpu.Circuit("H 0\nT 0\nM 0").compile_sampler(seed=7).save(path)
    with pytest.raises(TypeError):
        CompiledDetectorSampler.load(path)
