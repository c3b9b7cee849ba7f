"""Evaluation CLI (parity with the reference `tools/test.py`).

Usage:
    python tools/test.py --cfg_file configs/kitti_models/pdm_ssd.yaml
        --ckpt output/.../ckpt [--batch_size B] [--set KEY VALUE ...]
"""
from __future__ import annotations

import argparse
import datetime
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from pdm_ssd_tpu.utils.config import CfgNode, cfg_from_yaml_file, cfg_from_list  # noqa: E402
from pdm_ssd_tpu.utils import common_utils  # noqa: E402


def parse_config():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str, required=True)
    parser.add_argument('--batch_size', type=int, default=None)
    parser.add_argument('--workers', type=int, default=4)
    parser.add_argument('--extra_tag', type=str, default='default')
    parser.add_argument('--ckpt', type=str, default=None,
                        help='checkpoint dir (orbax CheckpointManager root)')
    parser.add_argument('--ckpt_step', type=int, default=None)
    parser.add_argument('--eval_all', action='store_true', default=False,
                        help='evaluate every checkpoint the manager produces')
    parser.add_argument('--max_waiting_mins', type=int, default=30,
                        help='max minutes to wait for new checkpoints (--eval_all)')
    parser.add_argument('--profile', action='store_true', default=False,
                        help='capture a jax.profiler trace of the first eval batches')
    parser.add_argument('--matmul_precision', type=str, default=None,
                        choices=['bfloat16', 'tensorfloat32', 'float32'],
                        help='jax_default_matmul_precision for the eval '
                             '(bench.py uses bfloat16; default: f32). '
                             'Used for the bf16 AP-budget measurement.')
    parser.add_argument('--cpu', action='store_true', default=False,
                        help='run on host CPU devices (the env sitecustomize '
                             'force-registers the TPU backend, so the '
                             'JAX_PLATFORMS env var alone does not stick)')
    parser.add_argument('--set', dest='set_cfgs', default=None, nargs=argparse.REMAINDER)
    args = parser.parse_args()
    if args.cpu:
        import jax
        jax.config.update('jax_platforms', 'cpu')
    if args.matmul_precision:
        import jax
        jax.config.update('jax_default_matmul_precision',
                          args.matmul_precision)
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
    jax.config.update('jax_persistent_cache_min_compile_time_secs', 2.0)
    from pdm_ssd_tpu.datasets import build_dataloader
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from pdm_ssd_tpu.runtime import trainer, eval_utils

    batch_size = args.batch_size or cfg.OPTIMIZATION.BATCH_SIZE_PER_GPU * jax.device_count()
    output_dir = REPO / 'output' / cfg.EXP_GROUP_PATH / cfg.TAG / args.extra_tag
    eval_dir = output_dir / 'eval'
    (eval_dir / 'final_result/data').mkdir(parents=True, exist_ok=True)

    log_file = eval_dir / ('log_eval_%s.log' % datetime.datetime.now().strftime('%Y%m%d-%H%M%S'))
    logger = common_utils.create_logger(log_file, rank=0)

    test_set, test_loader, _ = build_dataloader(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES,
        batch_size=batch_size, root_path=Path(cfg.DATA_CONFIG.DATA_PATH),
        workers=args.workers, logger=logger, training=False)

    model = build_network(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset_cfg=cfg.DATA_CONFIG,
                          class_names=cfg.CLASS_NAMES)
    host_prepare = get_host_prepare(cfg.MODEL, cfg.DATA_CONFIG)
    example_batch = next(iter(test_loader))
    if host_prepare is not None:
        example_batch = host_prepare(example_batch)
    state, tx, _ = trainer.create_train_state(
        model, trainer._filter_device_batch(example_batch), cfg.OPTIMIZATION,
        total_iters_each_epoch=1, total_epochs=1)

    def run_eval(state, tag=''):
        if args.profile:
            import jax
            jax.profiler.start_trace(str(eval_dir / 'profile'))
        ret = eval_utils.eval_one_epoch(
            model, state.params, state.batch_stats, test_loader, test_set,
            cfg.CLASS_NAMES, logger=logger, result_dir=eval_dir,
            host_prepare=host_prepare)
        if args.profile:
            import jax
            jax.profiler.stop_trace()
            logger.info(f"profiler trace written to {eval_dir / 'profile'}")
        logger.info(f'{tag}{ret}')
        return ret

    if args.ckpt and args.eval_all:
        # poll the checkpoint dir, evaluating each new step
        # (`repeat_eval_ckpt`, reference test.py:89-135)
        import time as _time
        ckpt_manager = trainer.make_checkpoint_manager(str(Path(args.ckpt).resolve()))
        evaluated = set()
        record = eval_dir / 'eval_list_val.txt'
        if record.exists():
            evaluated = set(int(x) for x in record.read_text().split())
        waited = 0.0
        while True:
            steps = [s for s in (ckpt_manager.all_steps() or []) if s not in evaluated]
            if not steps:
                if waited >= args.max_waiting_mins * 60:
                    break
                _time.sleep(30)
                waited += 30
                continue
            waited = 0.0
            for s in sorted(steps):
                state, _ = trainer.restore_checkpoint(ckpt_manager, state, step=s)
                run_eval(state, tag=f'[epoch {s}] ')
                evaluated.add(s)
                with open(record, 'a') as f:
                    f.write(f'{s}\n')
        return

    if args.ckpt:
        ckpt_manager = trainer.make_checkpoint_manager(str(Path(args.ckpt).resolve()))
        state, step = trainer.restore_checkpoint(ckpt_manager, state, step=args.ckpt_step)
        logger.info(f'loaded checkpoint step {step}')
    else:
        logger.warning('no --ckpt given: evaluating randomly initialized weights')
    run_eval(state)


if __name__ == '__main__':
    main()
