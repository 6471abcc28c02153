"""Detector error model tests: mechanism exactness + statistical agreement."""

import random

import numpy as np
import pytest

import tsim_tpu
from tests.helpers.gen import gen_circuit_text
from tsim_tpu.stim_core.dem import _find_gauge_parities, circuit_to_dem
from tsim_tpu.stim_core.frame import FrameSampler

CLIFFORD = {
    "S": 1, "H": 2, "SQRT_X": 1, "SQRT_Y": 1, "CNOT": 2, "CZ": 1,
    "X": 1, "Z": 1, "Y": 1,
}


def _dem_first_order_rates(dem):
    rates = np.zeros(dem.num_detectors)
    for ins in dem:
        if ins.type == "error":
            p = ins.args[0]
            for t in ins.targets:
                if t.kind == "D":
                    rates[t.val] = rates[t.val] + p - 2 * rates[t.val] * p
    return rates


@pytest.mark.parametrize("batch", range(4))
def test_single_mechanism_symptoms_exact(batch):
    """Deterministic single errors: DEM symptoms == frame-sampled flips."""
    rng = random.Random(batch)
    checked = 0
    for trial in range(15):
        seed = batch * 15 + trial
        text = gen_circuit_text(3, 15, include_measurements=False,
                                gate_weights=CLIFFORD, seed=seed)
        lines = text.splitlines()
        pos = rng.randrange(1, len(lines) + 1)
        q = rng.randrange(3)
        err = rng.choice(["X_ERROR(1)", "Z_ERROR(1)", "Y_ERROR(1)"])
        if rng.random() < 0.5:
            lines.insert(
                rng.randrange(1, len(lines)),
                f"{rng.choice(['MR', 'M', 'MX', 'MRX'])} {rng.randrange(3)}",
            )
        lines.insert(pos, f"{err} {q}")
        lines += ["MZZ 0 1 1 2", "MX 0", "DETECTOR rec[-3]",
                  "DETECTOR rec[-2]", "DETECTOR rec[-1]"]
        c = tsim_tpu.Circuit("\n".join(lines))
        det_lists, seen = [], 0
        for instr in c._stim_circ.flattened():
            if instr.name == "DETECTOR":
                det_lists.append([seen + t.value for t in instr.targets_copy()])
            seen += instr.num_measurements
        gm = _find_gauge_parities(
            c._stim_circ.without_noise(), det_lists, {}, len(det_lists)
        )
        gauge = {b for m in gm for b in range(64) if (m >> b) & 1}
        keep = [i for i in range(len(det_lists)) if i not in gauge]
        m, d, o = FrameSampler(c, seed=1).sample(4)
        dk = d[:, keep]
        assert (dk == dk[0]).all(), "non-gauge detectors must be deterministic"
        actual = {keep[int(i)] for i in np.flatnonzero(dk[0])}
        dem = circuit_to_dem(c._stim_circ, allow_gauge_detectors=True)
        pred = set()
        for ins in dem:
            if ins.type == "error" and abs(ins.args[0] - 1) < 1e-9:
                for t in ins.targets:
                    if t.kind == "D":
                        pred ^= {t.val}
        assert pred - gauge == actual, "\n".join(lines)
        checked += 1
    assert checked >= 8


def test_surface_code_dem_rates_match_frame_sampler():
    from tsim_tpu.models.surface_code import rotated_surface_code_memory_z

    c = rotated_surface_code_memory_z(
        3, 2, after_clifford_depolarization=0.03,
        before_measure_flip_probability=0.02,
    )
    m, d, o = FrameSampler(c, seed=0).sample(50000)
    dem = c.detector_error_model(approximate_disjoint_errors=True)
    rates = _dem_first_order_rates(dem)
    assert np.abs(rates - d.mean(axis=0)).max() < 0.006


def test_gauge_detector_raises_without_flag():
    c = tsim_tpu.Circuit("R 0\nH 0\nM 0\nDETECTOR rec[-1]")
    with pytest.raises(ValueError, match="gauge"):
        circuit_to_dem(c._stim_circ)
    dem = circuit_to_dem(c._stim_circ, allow_gauge_detectors=True)
    assert "error(0.5) D0" in str(dem)


def test_disjoint_channel_requires_flag():
    c = tsim_tpu.Circuit("R 0\nPAULI_CHANNEL_1(0.1, 0.2, 0) 0\nM 0\nDETECTOR rec[-1]")
    with pytest.raises(ValueError, match="disjoint"):
        circuit_to_dem(c._stim_circ)
    dem = circuit_to_dem(c._stim_circ, approximate_disjoint_errors=True)
    assert dem.num_detectors == 1


def test_non_deterministic_observable_dem():
    # Observable fed by a non-deterministic measurement: plain DEM would drop
    # or reject it; the tsim wrapper keeps it as L0.
    c = tsim_tpu.Circuit(
        """
        R 0 1
        H 0
        CNOT 0 1
        X_ERROR(0.1) 0
        M 0 1
        DETECTOR rec[-1] rec[-2]
        OBSERVABLE_INCLUDE(0) rec[-1]
        """
    )
    dem = c.detector_error_model()
    assert dem.num_observables == 1
    txt = str(dem)
    assert "error(0.1) D0" in txt


# ------------------------------------------------------- decompose_errors
import numpy as np
import pytest

from tsim_tpu.noise.dem import get_detector_error_model


def _mechanism_sets(dem):
    """{(frozen dets, frozen obs): prob} with suggested components recombined."""
    out = {}
    for instr in dem:
        if instr.type != "error":
            continue
        dets, obs = set(), set()
        for t in instr.targets_copy():
            if t.is_relative_detector_id():
                dets.symmetric_difference_update({t.val})
            elif t.is_logical_observable_id():
                obs.symmetric_difference_update({t.val})
        out[(frozenset(dets), frozenset(obs))] = instr.args_copy()[0]
    return out


def test_decompose_errors_surface_code_graphlike():
    from tsim_tpu.models.surface_code import rotated_surface_code_memory_z

    c = rotated_surface_code_memory_z(
        3, 2,
        after_clifford_depolarization=0.01,
        before_measure_flip_probability=0.01,
    ).cast_to_stim()
    plain = get_detector_error_model(
        c, allow_non_deterministic_observables=False
    )
    dec = get_detector_error_model(
        c, allow_non_deterministic_observables=False, decompose_errors=True
    )
    # every component is graphlike (<= 2 detectors)
    saw_separator = False
    for instr in dec:
        if instr.type != "error":
            continue
        comp_dets = 0
        for t in instr.targets_copy():
            if t.is_separator():
                saw_separator = True
                assert comp_dets <= 2
                comp_dets = 0
            elif t.is_relative_detector_id():
                comp_dets += 1
        assert comp_dets <= 2
    assert saw_separator  # depolarization produces Y-type hyperedges
    # recombined mechanisms identical to the undecomposed model
    assert _mechanism_sets(dec).keys() == _mechanism_sets(plain).keys()
    for k, p in _mechanism_sets(plain).items():
        assert _mechanism_sets(dec)[k] == pytest.approx(p)


def test_decompose_errors_failure_raises():
    import tsim_tpu

    # One 3-detector mechanism and nothing graphlike to build from.
    c = tsim_tpu.Circuit(
        "E(0.1) X0 X1 X2\nM 0 1 2\n"
        "DETECTOR rec[-3]\nDETECTOR rec[-2]\nDETECTOR rec[-1]"
    ).cast_to_stim()
    with pytest.raises(ValueError, match="[Dd]ecompose"):
        get_detector_error_model(
            c, allow_non_deterministic_observables=False, decompose_errors=True
        )
    dem = get_detector_error_model(
        c,
        allow_non_deterministic_observables=False,
        decompose_errors=True,
        ignore_decomposition_failures=True,
    )
    [err] = [i for i in dem if i.type == "error"]
    assert sum(1 for t in err.targets_copy() if t.is_separator()) == 0


def test_decompose_errors_remnant_edge_control():
    import tsim_tpu

    # {D0} exists graphlike; {D1, D2} must be invented as a remnant edge.
    text = (
        "E(0.1) X0 X1 X2\nX_ERROR(0.05) 0\nM 0 1 2\n"
        "DETECTOR rec[-3]\nDETECTOR rec[-2]\nDETECTOR rec[-1]"
    )
    c = tsim_tpu.Circuit(text).cast_to_stim()
    dem = get_detector_error_model(
        c, allow_non_deterministic_observables=False, decompose_errors=True
    )
    big = [
        i for i in dem
        if i.type == "error"
        and sum(1 for t in i.targets_copy() if t.is_relative_detector_id()) == 3
    ]
    [err] = big
    assert sum(1 for t in err.targets_copy() if t.is_separator()) == 1
    with pytest.raises(ValueError, match="[Dd]ecompose"):
        get_detector_error_model(
            c,
            allow_non_deterministic_observables=False,
            decompose_errors=True,
            block_decomposition_from_introducing_remnant_edges=True,
        )


def test_decompose_errors_rejected_with_non_deterministic_observables():
    import tsim_tpu

    c = tsim_tpu.Circuit("X_ERROR(0.1) 0\nM 0\nDETECTOR rec[-1]").cast_to_stim()
    with pytest.raises(ValueError, match="non-deterministic"):
        get_detector_error_model(c, decompose_errors=True)
