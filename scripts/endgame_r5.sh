#!/bin/bash
# Round-5 endgame: runs unattended once ladder training exits.
#   1. multi-sequence RD eval suite (chip)     -> results/*.csv + plots
#   2. golden RD anchor refresh from r3 (CPU)  -> tests/golden/*
#   3. headline bench (chip)                   -> /tmp/bench_r5_final.json
#   4. commit checkpoints + results
# One TPU process at a time: step 1 starts only after the training PID
# (/tmp/train_r5.pid) exits.
#
#   nohup bash scripts/endgame_r5.sh > /tmp/endgame_r5.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:/root/.axon_site

alive() { [ -f "$1" ] && kill -0 "$(cat "$1")" 2>/dev/null; }
while alive /tmp/train_r5.pid || alive /tmp/train_r5b.pid; do
  sleep 30
done
sleep 10
# phase 1 -> phase 2 handoff gap: if phase 2 hasn't started yet, give it
# two minutes to appear before concluding training is over
if ! alive /tmp/train_r5b.pid; then
  sleep 120
  while alive /tmp/train_r5b.pid; do sleep 30; done
fi

missing=0
for i in 1 2 3 4 5 6 7; do
  [ -f "ckpts/r$i/r${i}_final.ckpt" ] || { echo "MISSING ckpts/r$i"; missing=1; }
done

if [ "$missing" = 0 ]; then
  timeout 5400 python scripts/eval_suite_r5.py || echo "EVAL SUITE FAILED"
  JAX_PLATFORMS=cpu timeout 1800 python scripts/make_golden.py \
    --ckpt ckpts/r3/r3_final.ckpt || echo "GOLDEN REFRESH FAILED"
fi

timeout 3600 python bench.py > /tmp/bench_r5_final.json 2>/tmp/bench_r5_final.err
cat /tmp/bench_r5_final.json

git add -f ckpts/*/[a-z]*_final.ckpt 2>/dev/null
git add results tests/golden
git commit -m "Round-5 trained ladder: checkpoints, multi-sequence RD results, refreshed golden anchor" || true
