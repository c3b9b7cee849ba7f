"""Merge GT-sampling databases across datasets/splits into one dbinfos pickle
(parity with `tools/process_tools/create_integrated_database.py`).

Usage:
    python tools/process_tools/create_integrated_database.py \
        --db_info_paths data/kitti/kitti_dbinfos_train.pkl data/other/dbinfos.pkl \
        --output data/integrated_dbinfos_train.pkl [--classes Car Pedestrian]
"""
from __future__ import annotations

import argparse
import pickle
from pathlib import Path


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument('--db_info_paths', nargs='+', required=True)
    parser.add_argument('--output', type=str, required=True)
    parser.add_argument('--classes', nargs='+', default=None)
    args = parser.parse_args()

    merged: dict = {}
    for path in args.db_info_paths:
        with open(path, 'rb') as f:
            infos = pickle.load(f)
        root = Path(path).resolve().parent
        for cls, items in infos.items():
            if args.classes and cls not in args.classes:
                continue
            for it in items:
                # re-anchor relative paths so samplers rooted elsewhere resolve
                it['path'] = str((root / it['path']).resolve())
            merged.setdefault(cls, []).extend(items)

    for cls, items in merged.items():
        print(f'{cls}: {len(items)} objects')
    with open(args.output, 'wb') as f:
        pickle.dump(merged, f)
    print(f'integrated database written to {args.output}')


if __name__ == '__main__':
    main()
