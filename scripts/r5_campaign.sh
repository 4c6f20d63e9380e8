#!/bin/bash
# Round-5 serialized chip campaign (single-tenant TPU: one job at a time;
# see .claude/skills/verify/SKILL.md "Single-tenant TPU").
#
# Stage A (garment, VERDICT r4 "Next #1"): from the shared 300k stage-1
#   checkpoint, sweep the reference's own per-scan knob — ft at
#   sparse_weight 0.01 (the reference README finetune recipe,
#   ref bashs/bash_garment_blending.sh:32) — and the ft-with-blending
#   variant (the membrane-carving mechanism proven on lobed).
# Stage B (lobed, VERDICT "Next #3/#5"): regenerate the r3 stage-1 + ft
#   rows on the regenerated scene, A/B blend_top_k 32 vs 16, and score one
#   row with the Lewiner MC backend.
#
# Each step appends a JSON row to exp/benchmark_{garment,lobed}/results.jsonl.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/r5_campaign.log
say() { echo "[campaign $(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

GCK=exp/benchmark_garment/garment_r5_s1/udf_garment/checkpoints/ckpt_300000.ckpt

# -- wait for the in-flight garment stage-1 (pid file) to finish ----------
if [ -f /tmp/garment_s1.pid ]; then
  say "waiting for garment stage-1 (pid $(cat /tmp/garment_s1.pid)) ..."
  while kill -0 "$(cat /tmp/garment_s1.pid)" 2>/dev/null; do sleep 60; done
fi
say "garment stage-1 done; ckpt present: $(ls -la $GCK 2>/dev/null | wc -l)"

# if stage-1 died short of 300k (chip wedge / kill), resume it — resume is
# bit-exact incl. RNG fast-forward (test_resume), so the result is the same
# run. Up to two attempts.
for attempt in 1 2; do
  [ -f "$GCK" ] && break
  say "stage-1 incomplete; resuming from latest ckpt (attempt $attempt)"
  timeout 7200 python scripts/benchmark_garment.py --tag garment_r5_s1 \
    --iters 300000 --ft_iters 0 --resume >> "$LOG" 2>&1 \
    || say "stage-1 resume rc=$?"
done

if [ -f "$GCK" ]; then
  say "A1: garment ft, sparse_weight=0.01 (reference README ft recipe)"
  timeout 7200 python scripts/benchmark_garment.py --tag garment_r5_ft_s01 \
    --iters 0 --ft_iters 50000 --sparse_weight 0.01 \
    --ft_init_ckpt "$GCK" >> "$LOG" 2>&1 || say "A1 FAILED rc=$?"

  say "A2: garment ft + blending losses (membrane carver)"
  timeout 9000 python scripts/benchmark_garment.py --tag garment_r5_ftblend \
    --iters 0 --ft_iters 50000 --ft_blend \
    --ft_init_ckpt "$GCK" >> "$LOG" 2>&1 || say "A2 FAILED rc=$?"

  say "A3: garment ft + blending + sparse_weight=0.01 (combo)"
  timeout 9000 python scripts/benchmark_garment.py --tag garment_r5_ftblend_s01 \
    --iters 0 --ft_iters 50000 --ft_blend --sparse_weight 0.01 \
    --ft_init_ckpt "$GCK" >> "$LOG" 2>&1 || say "A3 FAILED rc=$?"
else
  say "no garment 300k ckpt — skipping stage A fts"
fi

# -- stage B needs the regenerated lobed scene -----------------------------
say "waiting for lobed scene regen ..."
while [ ! -f data/synthetic/lobed/cameras.npz ]; do sleep 60; done
say "lobed scene present"

say "B1: lobed stage-1 50k"
timeout 7200 python scripts/benchmark_lobed.py --tag r5_stage1_50k \
  --iters 50000 >> "$LOG" 2>&1 || say "B1 FAILED rc=$?"
LCK=exp/benchmark_lobed/r5_stage1_50k/udf_synthetic/checkpoints/ckpt_050000.ckpt

if [ -f "$LCK" ]; then
  say "B2: lobed ft 50k (blend_top_k=32 baseline)"
  timeout 10800 python scripts/benchmark_lobed.py --tag r5_ft50k \
    --iters 50000 --skip_train --init_ckpt "$LCK" --ft_iters 50000 \
    >> "$LOG" 2>&1 || say "B2 FAILED rc=$?"

  say "B3: lobed ft 50k blend_top_k=16 (quality A/B for the -19% kernel win)"
  timeout 10800 python scripts/benchmark_lobed.py --tag r5_ft50k_k16 \
    --iters 50000 --skip_train --init_ckpt "$LCK" --ft_iters 50000 \
    --blend_top_k 16 >> "$LOG" 2>&1 || say "B3 FAILED rc=$?"

  FCK=exp/benchmark_lobed/r5_ft50k/udf_synthetic/checkpoints/ckpt_050000.ckpt
  if [ -f "$FCK" ]; then
    say "B4: lobed Lewiner-backend row (same ft ckpt as B2, extraction only)"
    timeout 7200 python scripts/benchmark_lobed.py --tag r5_ft50k_lewiner \
      --iters 50000 --skip_train --init_ckpt "$FCK" --mc_backend lewiner \
      >> "$LOG" 2>&1 || say "B4 FAILED rc=$?"
  fi
else
  say "no lobed stage-1 ckpt — skipping B2-B4"
fi

say "final: bench.py (round-5 closing measurement, quiet chip)"
timeout 1200 python bench.py >> "$LOG" 2>&1 || say "bench FAILED rc=$?"

say "campaign complete"
