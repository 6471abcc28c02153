"""Forced-f32 vs exact sampling comparison, captured as a JSON artifact.

Runs the same seeded detector sampling twice on the real chip — once with
the f32 sampling kernel forced (TSIM_TPU_SAMPLE_EVAL=f32, the TPU default
path) and once with the exact Z[w] kernels forced — and records:

* whether the sample streams are BIT-IDENTICAL (same seed, same batch
  size: identical iff every Bernoulli probability rounds identically),
* per-detector fire-fraction z-scores between the two runs,
* the max norm deviation reported by each mode's monitor.

Appends one JSON line per workload to F32_ACCURACY.json (committed
artifact, cited from docs/benchmarks.md). Run on the TPU host:

    python dev/f32_accuracy_capture.py [shots_log2]
"""
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

WORKER = r"""
import json, sys
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
sys.path.insert(0, "/root/repo")

name, shots, batch = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
if name == "d3_distillation":
    from tsim_tpu.models.distillation import distillation_d3
    c = distillation_d3(p=0.05)
elif name == "cultivation2":
    from tsim_tpu.models.cultivation import cultivation_d3
    c = cultivation_d3(p=0.001, checks=2)
else:
    raise SystemExit(f"unknown workload {name}")
s = c.compile_detector_sampler(seed=0)
det = s.sample(shots, batch_size=batch)
np.save(sys.argv[4], np.packbits(det, axis=1))
print(json.dumps({"shape": list(det.shape), "mean": float(det.mean())}))
"""


def run_mode(name, shots, batch, mode, out):
    env = dict(os.environ)
    env["TSIM_TPU_SAMPLE_EVAL"] = mode
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-c", WORKER, name, str(shots), str(batch), out],
        capture_output=True, text=True, env=env, cwd=REPO,
    )
    if r.returncode != 0:
        raise RuntimeError(f"{name}/{mode} failed:\n{r.stderr[-2000:]}")
    info = json.loads(r.stdout.strip().splitlines()[-1])
    info["seconds"] = round(time.time() - t0, 1)
    return info


def main():
    import numpy as np

    shots = 1 << (int(sys.argv[1]) if len(sys.argv) > 1 else 16)
    specs = [("d3_distillation", shots, min(shots, 1 << 16)),
             ("cultivation2", shots, min(shots, 1 << 14))]
    path = os.path.join(REPO, "F32_ACCURACY.json")
    for name, n, batch in specs:
        a, b = f"/tmp/f32cap_{name}_f32.npy", f"/tmp/f32cap_{name}_exact.npy"
        info_f = run_mode(name, n, batch, "f32", a)
        info_e = run_mode(name, n, batch, "exact", b)
        df = np.unpackbits(np.load(a), axis=1)
        de = np.unpackbits(np.load(b), axis=1)
        identical = bool(np.array_equal(df, de))
        pf, pe = df.mean(axis=0), de.mean(axis=0)
        # Two-sample z per detector (pooled); guard all-zero detectors.
        pool = (pf + pe) / 2
        var = pool * (1 - pool) * 2 / n
        z = np.abs(pf - pe) / np.sqrt(np.maximum(var, 1e-12))
        z = np.where(pool == 0, 0.0, z)
        line = {
            "workload": name,
            "shots": n,
            "bit_identical": identical,
            "max_detector_z": round(float(z.max()), 3),
            "mean_f32": round(float(pf.mean()), 6),
            "mean_exact": round(float(pe.mean()), 6),
            "f32_seconds": info_f["seconds"],
            "exact_seconds": info_e["seconds"],
            "timestamp": time.strftime("%Y-%m-%d"),
        }
        with open(path, "a") as fh:
            fh.write(json.dumps(line) + "\n")
        print(json.dumps(line), flush=True)


if __name__ == "__main__":
    main()
