"""Training CLI (parity with the reference `tools/train.py`).

Usage:
    python tools/train.py --cfg_file configs/kitti_models/pdm_ssd.yaml [--epochs N]
        [--batch_size B] [--extra_tag TAG] [--workers W] [--fix_random_seed]
        [--set KEY VALUE ...]
Output dir convention (train.py:90-95): output/<exp_group>/<tag>/<extra_tag>/.
"""
from __future__ import annotations

import argparse
import datetime
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from pdm_ssd_tpu.utils.config import CfgNode, cfg_from_yaml_file, cfg_from_list, \
    log_config_to_file  # noqa: E402
from pdm_ssd_tpu.utils import common_utils  # noqa: E402


def parse_config():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--epochs', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--pretrained_model', type=str, default=None,
                        help='checkpoint dir to overlay params from (no resume)')
    parser.add_argument('--fix_random_seed', action='store_true', default=False)
    parser.add_argument('--max_ckpt_save_num', type=int, default=5)
    parser.add_argument('--merge_all_iters_to_one_epoch', action='store_true', default=False)
    parser.add_argument('--profile', action='store_true', default=False,
                        help='capture a jax.profiler trace of the first training steps')
    parser.add_argument('--cpu', action='store_true', default=False,
                        help='run on host CPU devices (the env sitecustomize '
                             'force-registers the TPU backend, so the '
                             'JAX_PLATFORMS env var alone does not stick)')
    parser.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')

    cfg = cfg_from_yaml_file(args.cfg_file, CfgNode())
    if args.set_cfgs is not None:
        cfg_from_list(args.set_cfgs, cfg)
    return args, cfg


def main():
    args, cfg = parse_config()
    import jax
    # persistent XLA compile cache: CLI restarts skip the 8-17 min
    # sparse-graph compiles (same config the benches already use)
    jax.config.update('jax_compilation_cache_dir',
                      str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      2.0)
    from pdm_ssd_tpu.datasets import build_dataloader
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from pdm_ssd_tpu.runtime import trainer

    if args.fix_random_seed:
        common_utils.set_random_seed(666)

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU * jax.device_count()
    epochs = args.epochs or cfg.OPTIMIZATION.NUM_EPOCHS

    output_dir = REPO / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    ckpt_dir = output_dir / 'ckpt'
    output_dir.mkdir(parents=True, exist_ok=True)
    ckpt_dir.mkdir(parents=True, exist_ok=True)

    log_file = output_dir / ('train_%s.log' % datetime.datetime.now().strftime('%Y%m%d-%H%M%S'))
    logger = common_utils.create_logger(log_file, rank=0)
    logger.info('**********************Start logging**********************')
    logger.info(f'devices: {jax.devices()}')
    log_config_to_file(cfg, logger=logger)

    train_set, train_loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size, root_path=Path(cfg.DATA_CONFIG.DATA_PATH),
        workers=args.workers, logger=logger, training=True,
        merge_all_iters_to_one_epoch=args.merge_all_iters_to_one_epoch,
        total_epochs=epochs, seed=666 if args.fix_random_seed else None)

    model = build_network(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset_cfg=cfg.DATA_CONFIG,
                          class_names=cfg.CLASS_NAMES)
    host_prepare = get_host_prepare(cfg.MODEL, cfg.DATA_CONFIG, training=True)
    example_batch = next(iter(train_loader))
    if host_prepare is not None:
        example_batch = host_prepare(example_batch)
    state, tx, lr_sched = trainer.create_train_state(
        model, trainer._filter_device_batch(example_batch), cfg.OPTIMIZATION,
        total_iters_each_epoch=len(train_loader), total_epochs=epochs)

    if args.pretrained_model:
        state = trainer.load_pretrained(state, Path(args.pretrained_model).resolve(),
                                        logger=logger)
    ckpt_manager = trainer.make_checkpoint_manager(
        str(ckpt_dir), max_to_keep=args.max_ckpt_save_num)
    state, start_epoch = trainer.restore_checkpoint(ckpt_manager, state)
    if start_epoch > 0:
        logger.info(f'auto-resumed from epoch {start_epoch}')

    tb_writer = None
    try:
        from torch.utils.tensorboard import SummaryWriter
        tb_writer = SummaryWriter(log_dir=str(output_dir / 'tensorboard'))
    except Exception:
        pass

    logger.info('**********************Start training**********************')
    if args.profile:
        jax.profiler.start_trace(str(output_dir / 'profile'))
    trainer.train_model(model, state, tx, train_loader, total_epochs=epochs,
                        rank0_logger=logger, ckpt_manager=ckpt_manager,
                        start_epoch=start_epoch, tb_writer=tb_writer,
                        lr_sched=lr_sched, hook_cfg=cfg.get('HOOK'),
                        dataset=train_set, host_prepare=host_prepare)
    if args.profile:
        jax.profiler.stop_trace()
        logger.info(f"profiler trace written to {output_dir / 'profile'}")
    logger.info('**********************End training**********************')


if __name__ == '__main__':
    main()
