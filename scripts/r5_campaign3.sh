#!/bin/bash
# Round-5 campaign, part 3: finish the reference's per-scan sparse_weight
# sweep on the garment benchmark (ref: bashs/bash_garment_blending.sh:32-36
# exposes -s per scan; {0.001, 0.01} are measured at 6.28e-3 / 3.37e-3 —
# this runs the midpoint 0.003 and the above-bracket 0.03), then a lobed
# blend_top_k=32 ft control row so the k16 quality A/B has a same-scene
# control (VERDICT r4 item 3).
#
# All runs are deadline-guarded with timeout; one at a time on the chip.
set -u
cd /root/repo
LOG=/tmp/r5_campaign3.log
say() { echo "[campaign3 $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

GCK=exp/benchmark_garment/garment_r5_s1/udf_garment/checkpoints/ckpt_300000.ckpt
LCK=exp/benchmark_lobed/r5_stage1_50k/udf_synthetic/checkpoints/ckpt_050000.ckpt

# Chip probe first: a tiny matmul that blocks harmlessly until the worker
# grants (wedge recovery pattern — verify skill). No timeout: recovery can
# take 20-40 min and killing mid-handshake re-poisons the worker.
say "probe: waiting for a chip grant"
python - <<'EOF' >> "$LOG" 2>&1
import numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe result", float(np.asarray(x @ x)[0, 0]), flush=True)
EOF
say "probe done (chip answering)"

say "C1: garment ft, sparse_weight=0.003 (sweep midpoint)"
timeout 7200 python scripts/benchmark_garment.py --tag garment_r5_ft_s003 \
  --iters 0 --ft_iters 50000 --sparse_weight 0.003 \
  --ft_init_ckpt "$GCK" >> "$LOG" 2>&1 || say "C1 FAILED rc=$?"

say "C2: garment ft, sparse_weight=0.03 (bracket above the 0.01 winner)"
timeout 7200 python scripts/benchmark_garment.py --tag garment_r5_ft_s03 \
  --iters 0 --ft_iters 50000 --sparse_weight 0.03 \
  --ft_init_ckpt "$GCK" >> "$LOG" 2>&1 || say "C2 FAILED rc=$?"

say "C3: lobed ft 50k, blend_top_k=32 control (same stage-1 ckpt as the k16 row)"
timeout 9000 python scripts/benchmark_lobed.py --tag r5_ft50k_k32 \
  --iters 50000 --skip_train --init_ckpt "$LCK" --ft_iters 50000 \
  >> "$LOG" 2>&1 || say "C3 FAILED rc=$?"

say "campaign3 complete"
