"""Regenerate the synthetic mini-KITTI set used by CLI verification.

Creates `data/kitti` (frames + labels + calib), then runs the offline info
generation + GT-database creation (`create_kitti_infos` port). Deterministic
(seeded), so the set is reproducible instead of checked in.

Usage: python tools/make_mini_kitti.py [--root data/kitti] [--frames 6]
"""
import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default=str(REPO / 'data/kitti'))
    ap.add_argument('--frames', type=int, default=64)
    ap.add_argument('--n_bg', type=int, default=8000)
    ap.add_argument('--seed', type=int, default=0)
    ap.add_argument('--classes', default='Car,Pedestrian,Cyclist',
                    help='comma list; a single class reproduces the old '
                         'Car-only fixed-difficulty regime')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')  # host-side work only

    from pdm_ssd_tpu.datasets.kitti.synthetic import make_mini_kitti
    from pdm_ssd_tpu.datasets.kitti.kitti_dataset import create_kitti_infos
    from pdm_ssd_tpu.utils.config import CfgNode, cfg_from_yaml_file

    root = Path(args.root)
    if root.exists():
        shutil.rmtree(root)
    make_mini_kitti(root, n_frames=args.frames, seed=args.seed,
                    n_bg=args.n_bg, classes=tuple(args.classes.split(',')))

    ds_cfg = cfg_from_yaml_file(
        str(REPO / 'configs/dataset_configs/kitti_dataset.yaml'), CfgNode())
    ds_cfg.DATA_PATH = str(root)
    class_names = ['Car', 'Pedestrian', 'Cyclist']
    create_kitti_infos(ds_cfg, class_names, root, root, workers=1)
    print(f'mini-KITTI with {args.frames} frames at {root}')


if __name__ == '__main__':
    main()
