#!/bin/bash
# Round-5 campaign, part 5 (runs after campaign4 frees the chip):
#   E1: score A1's 25k ft checkpoint (extract+eval only) — the -s 0.01
#       ft iteration trend (25k vs 50k) decides whether more ft exposure
#       is still buying Chamfer (ROADMAP Remaining #2 decision input).
#   E2: 100k ft at the reference README setting (-s 0.01) from the same
#       stage-1 checkpoint — double the regularizer exposure in one clean
#       run (fresh warmup/anneal at 2x length, not a resume stack).
# Conditional follow-ups (gate sweep if D1 won) are appended by hand once
# campaign4's D1 result is read.
set -u
cd /root/repo
LOG=/tmp/r5_campaign5.log
say() { echo "[campaign5 $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

GCK=exp/benchmark_garment/garment_r5_s1/udf_garment/checkpoints/ckpt_300000.ckpt
A1CK25=exp/benchmark_garment/garment_r5_ft_s01/udf_garment/checkpoints/ckpt_025000.ckpt

say "probe: waiting for a chip grant"
python - <<'EOF' >> "$LOG" 2>&1
import numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe result", float(np.asarray(x @ x)[0, 0]), flush=True)
EOF
say "probe done (chip answering)"

say "E1: score A1 ft ckpt_025000 (extract+eval only)"
timeout 3600 python scripts/benchmark_garment.py --tag garment_r5_ft_s01_at25k \
  --iters 0 --ft_iters 0 --sparse_weight 0.01 \
  --ft_init_ckpt "$A1CK25" >> "$LOG" 2>&1 || say "E1 FAILED rc=$?"

say "E2: 100k ft at -s 0.01 from the stage-1 300k ckpt"
timeout 10800 python scripts/benchmark_garment.py --tag garment_r5_ft_s01_100k \
  --iters 0 --ft_iters 100000 --sparse_weight 0.01 \
  --ft_init_ckpt "$GCK" >> "$LOG" 2>&1 || say "E2 FAILED rc=$?"

say "campaign5 complete"
