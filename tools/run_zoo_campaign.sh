#!/bin/bash
# Round-5 fidelity campaign: train 5 detector families to convergence on the
# 64-frame 3-class mini-KITTI set (TPU, serial — the tunnel serializes
# clients), then eval each with the official-protocol KITTI AP (R11 + R40).
# Logs land in output/<exp_group>/<tag>/r5zoo/; a summary tail is printed.
set -u
cd "$(dirname "$0")/.."
TAG=r5zoo
LOG=output/campaign_${TAG}.log
: > "$LOG"

run () {
  local cfg=$1 epochs=$2 bs=$3
  echo "=== TRAIN $cfg (${epochs}ep, B=$bs) $(date +%H:%M:%S) ===" >> "$LOG"
  python -u tools/train.py --cfg_file "configs/kitti_models/$cfg.yaml" \
    --epochs "$epochs" --batch_size "$bs" --workers 0 --extra_tag $TAG \
    >> "$LOG" 2>&1 || { echo "TRAIN FAILED: $cfg" >> "$LOG"; return 1; }
  echo "=== EVAL $cfg $(date +%H:%M:%S) ===" >> "$LOG"
  python -u tools/test.py --cfg_file "configs/kitti_models/$cfg.yaml" \
    --batch_size 4 --workers 0 --extra_tag $TAG \
    --ckpt "output/kitti_models/$cfg/$TAG/ckpt" \
    >> "$LOG" 2>&1 || echo "EVAL FAILED: $cfg" >> "$LOG"
}

run centerpoint_pillar 300 2
run pdm_ssd 300 2
run pdm_ssd_point 150 2
run second_sparse 100 2
run pv_rcnn_sparse 100 2
echo "=== CAMPAIGN DONE $(date +%H:%M:%S) ===" >> "$LOG"
