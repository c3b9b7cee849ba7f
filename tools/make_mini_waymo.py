"""Regenerate the synthetic mini-Waymo sequence set for CLI verification.

Creates `data/waymo` in the processed-data layout `WaymoDataset` consumes
(per-sequence `.npy` frames + `<seq>.pkl` infos + ImageSets splits), plus
`pred_boxes.pkl` for the offline-proposal (USE_PREDBOX) MPPNet path.
Deterministic (seeded), so the set is reproducible instead of checked in.

Usage: python tools/make_mini_waymo.py [--root data/waymo] [--frames 8]
"""
import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default=str(REPO / 'data/waymo'))
    ap.add_argument('--seqs', type=int, default=1)
    ap.add_argument('--frames', type=int, default=8)
    ap.add_argument('--n_bg', type=int, default=2000)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--class_name', default='Vehicle')
    args = ap.parse_args()

    from pdm_ssd_tpu.datasets.waymo.synthetic import make_mini_waymo

    root = Path(args.root)
    if root.exists():
        shutil.rmtree(root)
    seqs = make_mini_waymo(root, n_seq=args.seqs, n_frames=args.frames,
                           n_bg=args.n_bg, seed=args.seed,
                           with_pred_boxes=True,
                           class_name=args.class_name)
    print(f'mini-Waymo with {len(seqs)} sequence(s) x {args.frames} frames '
          f'at {root} (+ pred_boxes.pkl for USE_PREDBOX)')


if __name__ == '__main__':
    main()
