#!/bin/sh
# Round-5 closing queue, v2: tunnel is in a degraded-bandwidth phase, so
# bandwidth-insensitive captures (accuracy, eval-only roofline) come first;
# the error-rate sweep banks its cheap panels before the cultivation tail.
set -x
cd /root/repo
export TSIM_TPU_BENCH_ROUND=5

# 1. f32-vs-exact accuracy capture -> F32_ACCURACY.json
timeout 1500 python dev/f32_accuracy_capture.py 16
echo "=== Q2 STEP1 DONE f32 capture ==="

# 2. Roofline with packed kernel (eval-only MFU; immune to tunnel phase)
timeout 1500 python dev/roofline.py 17 2
echo "=== Q2 STEP2 DONE roofline ==="

# 3. Surface-code scaling capture (d=5..11, PAULI_CHANNEL noise)
timeout 1800 python bench_suite.py scaling
echo "=== Q2 STEP3 DONE scaling ==="

# 4. Error-rate sweep capture (incremental persistence; cultivation last)
timeout 5400 python bench_suite.py sweep
echo "=== Q2 STEP4 DONE sweep ==="

# 5. Suite panels refresh (single-run best/median pairs)
TSIM_TPU_BENCH_PERSIST=1 timeout 2400 python bench_suite.py d3_distillation d5_distillation d7_surface_code
echo "=== Q2 STEP5 DONE fast panels ==="
TSIM_TPU_BENCH_PERSIST=1 timeout 2400 python bench_suite.py d3_cultivation d3_cultivation2
echo "=== Q2 STEP6 DONE cultivation panels ==="
