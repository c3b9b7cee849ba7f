"""Regenerate the synthetic mini-nuScenes set (lidar + CAM_FRONT) for CLI
verification of the camera pipeline.

Fabricates the v1.0 JSON tables + lidar sweeps + landmark-dot camera PNGs
(`datasets/nuscenes/synthetic.py`), then runs the devkit-free info
creation. Deterministic; regenerated on demand instead of checked in.

Usage: python tools/make_mini_nuscenes.py [--root data/nuscenes]
"""
import argparse
import shutil
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--root', default=str(REPO / 'data/nuscenes'))
    ap.add_argument('--samples', type=int, default=3)
    ap.add_argument('--max_sweeps', type=int, default=1)
    ap.add_argument('--no_cams', action='store_true')
    args = ap.parse_args()

    import jax
    jax.config.update('jax_platforms', 'cpu')  # host-side work only

    from pdm_ssd_tpu.datasets.nuscenes.synthetic import make_mini_nuscenes

    root = Path(args.root)
    if root.exists():
        shutil.rmtree(root)
    make_mini_nuscenes(root, with_cams=not args.no_cams,
                       n_samples=args.samples, max_sweeps=args.max_sweeps)
    print(f'mini-nuScenes with {args.samples} samples at {root} '
          f'(cams={not args.no_cams})')


if __name__ == '__main__':
    main()
