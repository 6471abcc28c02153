"""Randomized CompiledStateProbs-vs-statevector fuzz (noise-free
circuits: probability_of conditions on a noise draw, so only noiseless
circuits compare exactly against the oracle). Usage:
    python dev/fuzz_state_probs.py
"""
import sys, itertools, time
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import tsim_tpu
from tsim_tpu.external.vec_sim.vec_sampler import VecSampler
from tests.helpers.gen import gen_circuit_text

CLIFFORD_T = {"T": 2, "S": 1, "H": 2, "SQRT_X": 1, "SQRT_Y": 1, "CNOT": 2,
              "CZ": 1, "X": 1, "Z": 1, "Y": 1, "TPP2": 1}
WITH_ROT = dict(CLIFFORD_T, **{"R_X(0.31)": 1, "R_Z(0.33)": 1,
                               "U3(0.34, 0.21, 0.46)": 1, "R_PAULI2": 1})

fails = 0
t0 = time.time()
for seed in range(100, 160):
    weights = CLIFFORD_T if seed % 2 else WITH_ROT
    nq, depth = (3, 30) if seed % 3 else (4, 22)
    text = gen_circuit_text(nq, depth, gate_weights=weights, seed=seed)
    try:
        c = tsim_tpu.Circuit(text)
        sp = c.compile_state_probs(seed=seed)
        oracle = VecSampler(c, seed=seed)
        for bits in itertools.product([0, 1], repeat=min(c.num_measurements, 6)):
            bits = bits + (0,) * (c.num_measurements - len(bits))
            expected = oracle.probability_of(bits)
            got = sp.probability_of(np.array(bits), batch_size=1)[0]
            if abs(got - expected) > 1e-6:
                print(f"MISMATCH seed {seed} bits {bits}: got {got} want {expected}", flush=True)
                fails += 1
                break
    except Exception as e:
        print(f"ERROR seed {seed}: {type(e).__name__}: {e}", flush=True)
        fails += 1
    if time.time() - t0 > 3300:
        print(f"timebox at seed {seed}", flush=True); break
print(f"fuzz done: {fails} failures", flush=True)
