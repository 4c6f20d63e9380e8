#!/bin/bash
# Round-5 campaign, part 7 (fresh container; exp/ and scenes wiped again):
# the ft-iteration-trend experiment from ROADMAP Remaining #2 —
#   G0: wait for the garment scene regen (pure-CPU, 1-core box: chip work
#       must not overlap scene generation) and verify the hash manifest.
#   G1: stage-1 300k (full reference garment recipe) — replaces the wiped
#       garment_r5_s1 checkpoint.
#   G2: ft 100k at the README-recipe sparse_weight 0.01 (2x the r5 winner's
#       length; save_freq 25k leaves ckpts at 25/50/75/100k). The 100k
#       endpoint is scored by the run itself.
#   G3-G5: extract+score the 25k / 50k / 75k ft checkpoints -> the full
#       Chamfer-vs-ft-iterations trend in one ledger.
#   G6: control bench for the round record.
set -u
cd /root/repo
LOG=/tmp/r5_campaign7.log
say() { echo "[campaign7 $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

say "G0: waiting for scene regen (pid $(cat /tmp/regen.pid 2>/dev/null))"
if [ -f /tmp/regen.pid ]; then
  while kill -0 "$(cat /tmp/regen.pid)" 2>/dev/null; do sleep 30; done
fi
timeout 1800 python scripts/check_scene_manifest.py --scenes garment \
  >> "$LOG" 2>&1 || { say "G0 FAILED: manifest mismatch"; exit 1; }
say "G0 ok: garment scene verified"

say "probe: waiting for a chip grant"
timeout 900 python - <<'EOF' >> "$LOG" 2>&1
import numpy as np, jax.numpy as jnp
x = jnp.ones((128, 128))
print("probe result", float(np.asarray(x @ x)[0, 0]), flush=True)
EOF
say "probe done (chip answering)"

say "G1: garment stage-1 300k (reference recipe)"
timeout 7200 python scripts/benchmark_garment.py --tag garment_r6_s1 \
  --iters 300000 >> "$LOG" 2>&1 || say "G1 FAILED rc=$?"

S1CK=exp/benchmark_garment/garment_r6_s1/udf_garment/checkpoints/ckpt_300000.ckpt
[ -f "$S1CK" ] || { say "ABORT: stage-1 ckpt missing"; exit 1; }

say "G2: ft 100k at -s 0.01 (trend run; scores the 100k endpoint)"
timeout 7200 python scripts/benchmark_garment.py --tag garment_r6_ft100k_s01 \
  --iters 0 --ft_iters 100000 --sparse_weight 0.01 --ft_init_ckpt "$S1CK" \
  >> "$LOG" 2>&1 || say "G2 FAILED rc=$?"

FTDIR=exp/benchmark_garment/garment_r6_ft100k_s01/udf_garment/checkpoints
for K in 025000 050000 075000; do
  say "G3: score ft ckpt_${K}"
  timeout 3600 python scripts/benchmark_garment.py \
    --tag garment_r6_ft100k_s01_at${K} --iters 0 --ft_iters 0 \
    --sparse_weight 0.01 --ft_init_ckpt "$FTDIR/ckpt_${K}.ckpt" \
    >> "$LOG" 2>&1 || say "G3(${K}) FAILED rc=$?"
done

say "G6: control bench for the round record"
NEURALUDF_BENCH_STALL=1800 timeout 3600 python bench.py >> "$LOG" 2>&1 \
  || say "G6 FAILED rc=$?"

say "campaign7 complete"
