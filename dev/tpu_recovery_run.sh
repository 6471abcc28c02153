#!/bin/sh
# Priority-ordered TPU work queue for when the axon tunnel recovers.
# Captures first (the round's artifacts), measurements after.
# Usage: sh dev/tpu_recovery_run.sh >> /tmp/tpu_recovery.log 2>&1
set -x
cd /root/repo

# 0. Backend probe (fail fast if still wedged)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. Packed-kernel validation + headline bench
timeout 600 python bench.py || exit 1

# 2. Full benchmark suite -> BENCH_SUITE_r05.json (single-run best/median)
TSIM_TPU_BENCH_ROUND=5 timeout 3600 python bench_suite.py

# 3. f32-vs-exact accuracy capture -> F32_ACCURACY.json
timeout 1800 python dev/f32_accuracy_capture.py 16

# 4. Surface-code scaling capture (d=5..11)
TSIM_TPU_BENCH_ROUND=5 timeout 2400 python bench_suite.py scaling

# 5. Error-rate sweep capture
TSIM_TPU_BENCH_ROUND=5 timeout 5400 python bench_suite.py sweep

# 6. Roofline with packed kernel (MFU vs the 7.6% baseline)
timeout 1200 python dev/roofline.py 17 2

# 7. Tile knob sweep
TSIM_TPU_SAMPLE_SMALL_BT=4096 timeout 900 python dev/roofline.py 17 2
TSIM_TPU_SAMPLE_PLANE=262144 timeout 900 python dev/roofline.py 17 2
TSIM_TPU_SAMPLE_TPACK=0 timeout 900 python dev/roofline.py 17 2
