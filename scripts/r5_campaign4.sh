#!/bin/bash
# Round-5 campaign, part 4 (runs after campaign3 frees the chip):
#   D1: garment ft -s 0.01 + depth-gated sparse (the new
#       RendererConfig.sparse_depth_gate knob) — keep the 0.01 carve,
#       protect the photometric anchor the bias probe showed it lifts.
#   D2: flat-Adam bench A/B (NEURALUDF_FLAT_ADAM=1) — the measured
#       candidate for the 3.6 ms in-scan weight-restaging stall
#       (ROADMAP Remaining #2), vs the 16.97 ms campaign2 close.
#   D3: blend_scan_probe LAST (worker-crash risk wedges the chip;
#       ROADMAP queued chip probe #6).
set -u
cd /root/repo
LOG=/tmp/r5_campaign4.log
say() { echo "[campaign4 $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

GCK=exp/benchmark_garment/garment_r5_s1/udf_garment/checkpoints/ckpt_300000.ckpt

say "probe: waiting for a chip grant"
python - <<'EOF' >> "$LOG" 2>&1
import numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe result", float(np.asarray(x @ x)[0, 0]), flush=True)
EOF
say "probe done (chip answering)"

say "D0: retry garment ft -s 0.03 (campaign3's C2 lost its grant at iter 50)"
timeout 7200 python scripts/benchmark_garment.py --tag garment_r5_ft_s03 \
  --iters 0 --ft_iters 50000 --sparse_weight 0.03 \
  --ft_init_ckpt "$GCK" >> "$LOG" 2>&1 || say "D0 FAILED rc=$?"

say "D1: garment ft, -s 0.01 + sparse_depth_gate 0.01"
timeout 7200 python scripts/benchmark_garment.py --tag garment_r5_ft_s01_gate \
  --iters 0 --ft_iters 50000 --sparse_weight 0.01 --sparse_depth_gate 0.01 \
  --ft_init_ckpt "$GCK" >> "$LOG" 2>&1 || say "D1 FAILED rc=$?"

say "D2a: bench.py control (tree Adam)"
timeout 1800 python bench.py >> "$LOG" 2>&1 || say "D2a FAILED rc=$?"
say "D2b: bench.py flat Adam (NEURALUDF_FLAT_ADAM=1)"
NEURALUDF_FLAT_ADAM=1 timeout 1800 python bench.py >> "$LOG" 2>&1 \
  || say "D2b FAILED rc=$?"

say "D3 (LAST, crash-risk): blending step inside a lax.scan window"
timeout 1800 python scripts/blend_scan_probe.py >> "$LOG" 2>&1 \
  || say "D3 FAILED rc=$?"

say "campaign4 complete"
