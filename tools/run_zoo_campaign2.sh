#!/bin/bash
# Round-5 fidelity campaign, phase 2: the sparse two-stage families with
# threaded data workers (the 0.05 m host builder + GT sampling dominate at
# --workers 0), plus a continuation for the underfit point-exact flagship.
set -u
cd "$(dirname "$0")/.."
TAG=r5zoo
LOG=output/campaign_${TAG}2.log
: > "$LOG"

run () {
  local cfg=$1 epochs=$2 bs=$3 workers=$4
  echo "=== TRAIN $cfg (${epochs}ep, B=$bs, w=$workers) $(date +%H:%M:%S) ===" >> "$LOG"
  python -u tools/train.py --cfg_file "configs/kitti_models/$cfg.yaml" \
    --epochs "$epochs" --batch_size "$bs" --workers "$workers" --extra_tag $TAG \
    >> "$LOG" 2>&1 || { echo "TRAIN FAILED: $cfg" >> "$LOG"; return 1; }
  echo "=== EVAL $cfg $(date +%H:%M:%S) ===" >> "$LOG"
  python -u tools/test.py --cfg_file "configs/kitti_models/$cfg.yaml" \
    --batch_size 4 --workers 0 --extra_tag $TAG \
    --ckpt "output/kitti_models/$cfg/$TAG/ckpt" \
    >> "$LOG" 2>&1 || echo "EVAL FAILED: $cfg" >> "$LOG"
}

# single host CPU in this image: fork workers are useless (and risk
# the JAX-threads fork deadlock) — host work runs inline
run second_sparse 40 2 0
run pv_rcnn_sparse 40 2 0
run pdm_ssd_point 400 2 0     # auto-resumes from the phase-1 150-epoch ckpt
echo "=== CAMPAIGN2 DONE $(date +%H:%M:%S) ===" >> "$LOG"
