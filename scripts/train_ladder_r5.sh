#!/bin/bash
# Round-5 ladder retrain (VERDICT.md item 5: >=30 effective passes, 2x the
# round-4 content, beta fixed at 1, alpha swept; warm-start chain r1->r7).
#
# Round-4 recipe was 14 epochs x 240 clouds per point.  This run: 480 mixed
# synthetic surfaces (5 primitive families, data/synthetic.py), r1 from
# scratch with 14 epochs x 2 passes, then 5 epochs x 2 passes per warm
# point — every point sees 10+ passes over 2x the content, with the whole
# chain's effective passes ~= 38.
#
#   nohup bash scripts/train_ladder_r5.sh > /tmp/train_r5.log 2>&1 &
set -e
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site
# batch 6 (not 8): the 480-cloud mix has denser frames than round 4's 240;
# the batch-8 plan needed 16.2 GB HBM (OOM by ~0.5 GB) — batch 6 cuts the
# batch-proportional temps 25% and fits with margin.
python scripts/train_rd.py \
  --clouds 480 --repeats 2 --epochs 5 --batch_size 6 \
  --lr 8e-4 --lr_min 2e-5 \
  --points \
    r1:0.5:::14 \
    r2:2:ckpts/r1/r1_final.ckpt \
    r3:6:ckpts/r2/r2_final.ckpt \
    r4:18:ckpts/r3/r3_final.ckpt \
    r5:54:ckpts/r4/r4_final.ckpt \
    r6:160:ckpts/r5/r5_final.ckpt \
    r7:400:ckpts/r6/r6_final.ckpt:4e-4:7:0.7
