#!/bin/sh
# Priority-ordered TPU work queue for when the axon tunnel recovers.
# Usage: sh dev/tpu_recovery_run.sh >> /tmp/tpu_recovery.log 2>&1
set -x
cd /root/repo

# 0. Backend probe (fail fast if still wedged)
timeout 120 python -c "import jax; print(jax.devices())" || exit 1

# 1. Packed-kernel validation + headline bench
timeout 600 python bench.py

# 2. Roofline with packed kernel (MFU change vs 7.6% baseline)
timeout 1200 python dev/roofline.py 17 2

# 3. Tile knob sweep on the same roofline
TSIM_TPU_SAMPLE_SMALL_BT=4096 timeout 900 python dev/roofline.py 17 2
TSIM_TPU_SAMPLE_PLANE=262144 timeout 900 python dev/roofline.py 17 2
TSIM_TPU_SAMPLE_SMALL_BT=4096 TSIM_TPU_SAMPLE_PLANE=262144 \
  timeout 900 python dev/roofline.py 17 2
# Packed-off comparison point
TSIM_TPU_SAMPLE_TPACK=0 timeout 900 python dev/roofline.py 17 2
