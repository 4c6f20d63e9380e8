#!/bin/bash
# Round-5 campaign, part 6 (runs after campaign5 frees the chip):
#   F1: flat-Adam bench retry with a 30-min stall watchdog — campaign4's
#       D2b hang never produced a single output line, so it is ambiguous
#       between a spontaneous relay wedge and a flat-Adam-induced stall;
#       one clean retry disambiguates (control D2a was 16.82 ms).
#   F2: control bench (tree Adam) back-to-back for the A/B pair.
#   F3: lobed ft row with the new blend_scan_window default — confirms
#       the 1.8x probe win at benchmark scale AND that quality stays at
#       the k32 control row's 0.483 mm (same stage-1 checkpoint).
set -u
cd /root/repo
LOG=/tmp/r5_campaign6.log
say() { echo "[campaign6 $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

S1CK=exp/benchmark_lobed/r5_stage1_50k/udf_synthetic/checkpoints/ckpt_050000.ckpt

say "probe: waiting for a chip grant"
python - <<'EOF' >> "$LOG" 2>&1
import numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe result", float(np.asarray(x @ x)[0, 0]), flush=True)
EOF
say "probe done (chip answering)"

say "F0: E1 retry — score A1 ft ckpt_025000 (the campaign5 invocation hit"
say "    the unloaded-ft_init_ckpt harness bug, fixed in benchmark_garment.py)"
timeout 3600 python scripts/benchmark_garment.py --tag garment_r5_ft_s01_at25k \
  --iters 0 --ft_iters 0 --sparse_weight 0.01 \
  --ft_init_ckpt exp/benchmark_garment/garment_r5_ft_s01/udf_garment/checkpoints/ckpt_025000.ckpt \
  >> "$LOG" 2>&1 || say "F0 FAILED rc=$?"

say "F1: bench.py flat Adam (NEURALUDF_FLAT_ADAM=1, stall 1800)"
NEURALUDF_FLAT_ADAM=1 NEURALUDF_BENCH_STALL=1800 timeout 3600 python bench.py \
  >> "$LOG" 2>&1 || say "F1 FAILED rc=$?"

say "F2: bench.py control (tree Adam)"
NEURALUDF_BENCH_STALL=1800 timeout 3600 python bench.py >> "$LOG" 2>&1 \
  || say "F2 FAILED rc=$?"

say "F3: lobed ft 50k with blend_scan_window default (from r5 stage-1 ckpt)"
timeout 7200 python scripts/benchmark_lobed.py --tag r5_ft50k_k32_scanwin \
  --skip_train --init_ckpt "$S1CK" --ft_iters 50000 >> "$LOG" 2>&1 \
  || say "F3 FAILED rc=$?"

say "campaign6 complete"
