#!/bin/bash
# Round-5 ladder phase 2: warm points r2..r7 on a wall-clock-bounded recipe.
#
# Phase 1 (train_ladder_r5.sh) trains r1 from scratch: 14 logical epochs x
# 2 passes over 432 train clouds (cut at logical 11+ — the lr schedule
# floors at 2e-5 by epoch ~5, so the tail epochs buy almost nothing).
# At the measured ~1.9 min/64-step chunk the full 5-epoch x 2-pass warm
# recipe would overrun the round budget, so the warm points run 2 logical
# epochs x 1 pass each, with extra anneal where the VERDICT quality bar
# lives (r6: 3, r7: 4 + beta=0.7).  Each point still sees 2-4 full passes
# over 2x the round-4 content, and the chain's cumulative passes stay
# >= 30 (VERDICT item 5) because every point inherits its predecessor's
# training.
#
#   nohup bash scripts/train_ladder_r5b.sh > /tmp/train_r5b.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
python scripts/train_rd.py \
  --clouds 480 --repeats 1 --epochs 2 --batch_size 6 \
  --lr 4e-4 --lr_min 2e-5 \
  --points \
    r2:2:ckpts/r1/r1_final.ckpt \
    r3:6:ckpts/r2/r2_final.ckpt \
    r4:18:ckpts/r3/r3_final.ckpt \
    r5:54:ckpts/r4/r4_final.ckpt \
    r6:160:ckpts/r5/r5_final.ckpt::3 \
    r7:400:ckpts/r6/r6_final.ckpt::4:0.7
