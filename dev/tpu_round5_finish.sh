#!/bin/sh
# Final round-5 on-chip queue, prioritized for a ~1h window.
# Usage: sh dev/tpu_round5_finish.sh >> /tmp/tpu_r5.log 2>&1
set -x
cd /root/repo
export TSIM_TPU_BENCH_ROUND=5

# 0. Backend probe (fail fast if the tunnel wedges again)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. Packed-kernel validation + headline bench (driver runs this at round end)
timeout 900 python bench.py || exit 1
echo "=== STEP1 DONE bench.py ==="

# 2. Suite panels, single run each -> BENCH_SUITE_r05.json
#    (d3_cultivation_full already captured this round at 1.64M/1.56M)
timeout 2400 python bench_suite.py d3_distillation d5_distillation d7_surface_code
echo "=== STEP2 DONE fast panels ==="
timeout 2400 python bench_suite.py d3_cultivation d3_cultivation2
echo "=== STEP3 DONE cultivation panels ==="

# 3. f32-vs-exact accuracy capture -> F32_ACCURACY.json
timeout 1500 python dev/f32_accuracy_capture.py 16
echo "=== STEP4 DONE f32 capture ==="

# 4. Surface-code scaling capture (d=5..11, PAULI_CHANNEL noise)
timeout 1800 python bench_suite.py scaling
echo "=== STEP5 DONE scaling ==="

# 5. Roofline with packed kernel (MFU vs the 7.6% r4 baseline)
timeout 1200 python dev/roofline.py 17 2
echo "=== STEP6 DONE roofline ==="

# 6. Error-rate sweep capture (longest; run last)
timeout 5400 python bench_suite.py sweep
echo "=== STEP7 DONE sweep ==="
