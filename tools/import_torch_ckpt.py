"""Import a reference (torch) checkpoint into this framework's format.

Loads a `.pth` produced by the reference trainer (state under 'model_state',
`train_utils.checkpoint_state:221-254`), maps it into the flax param tree
via `utils/torch_import.import_state_dict` (name rules + layout
transposition, the analog of `detector3d_template._load_state_dict:330-359`),
and writes an Orbax checkpoint consumable by `tools/test.py --ckpt` and
`tools/train.py --pretrained_model`.

Usage:
  python tools/import_torch_ckpt.py --cfg_file configs/kitti_models/second_sparse.yaml \
      --torch_ckpt reference_second.pth --out output/imported/second_sparse
"""
import argparse
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument('--cfg_file', required=True)
    ap.add_argument('--torch_ckpt', required=True)
    ap.add_argument('--out', required=True,
                    help='output Orbax ckpt dir (saved as step 0)')
    ap.add_argument('--workers', type=int, default=0)
    ap.add_argument('--set', dest='set_cfgs', default=None,
                    nargs=argparse.REMAINDER)
    args = ap.parse_args()

    import torch
    from pdm_ssd_tpu.utils.config import (CfgNode, cfg_from_yaml_file,
                                          cfg_from_list)
    from pdm_ssd_tpu.utils import common_utils
    from pdm_ssd_tpu.utils.torch_import import import_state_dict
    from pdm_ssd_tpu.datasets import build_dataloader
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from pdm_ssd_tpu.runtime import trainer

    cfg = cfg_from_yaml_file(args.cfg_file, CfgNode())
    if args.set_cfgs:
        cfg_from_list(args.set_cfgs, cfg)
    logger = common_utils.create_logger(None, rank=0)

    ckpt = torch.load(args.torch_ckpt, map_location='cpu',
                      weights_only=False)
    sd = ckpt.get('model_state', ckpt)
    sd = {k: np.asarray(v.detach().numpy() if hasattr(v, 'detach') else v)
          for k, v in sd.items()}
    logger.info(f'{len(sd)} tensors in {args.torch_ckpt} '
                f'(version {ckpt.get("version", "?")})')

    # one real batch to trace shapes for init
    _, loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=1, root_path=Path(cfg.DATA_CONFIG.DATA_PATH),
        workers=args.workers, logger=logger, training=False)
    model = build_network(model_cfg=cfg.MODEL,
                          num_class=len(cfg.CLASS_NAMES),
                          dataset_cfg=cfg.DATA_CONFIG,
                          class_names=cfg.CLASS_NAMES)
    batch = next(iter(loader))
    prep = get_host_prepare(cfg.MODEL, cfg.DATA_CONFIG)
    if prep is not None:
        batch = prep(batch)
    state, tx, _ = trainer.create_train_state(
        model, batch, cfg.OPTIMIZATION, total_iters_each_epoch=1,
        total_epochs=1)

    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    variables, report = import_state_dict(sd, variables, logger=logger)
    state = state.replace(params=variables['params'],
                          batch_stats=variables.get('batch_stats', {}))

    out_dir = Path(args.out).resolve()
    mgr = trainer.make_checkpoint_manager(str(out_dir))
    trainer.save_checkpoint(mgr, state, 0)
    logger.info(f'imported {len(report["loaded"])} tensors '
                f'({len(report["unmatched"])} unmatched) -> {out_dir}')


if __name__ == '__main__':
    main()
