"""Single-frame inference demo (parity with the reference `tools/demo.py`).

Loads raw `.bin`/`.npy` point clouds, runs the jitted PDM-SSD predict step, and
prints the detected boxes (visualization hooks are optional — open3d/mayavi are
not part of the baked TPU image, so the demo prints results and can dump .npy).
"""
from __future__ import annotations

import argparse
import glob
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import numpy as np  # noqa: E402

from pdm_ssd_tpu.utils.config import CfgNode, cfg_from_yaml_file  # noqa: E402
from pdm_ssd_tpu.utils import common_utils  # noqa: E402
from pdm_ssd_tpu.datasets.dataset import DatasetTemplate  # noqa: E402


class DemoDataset(DatasetTemplate):
    """(`demo.py:20-57`.)"""

    def __init__(self, dataset_cfg, class_names, training=False, root_path=None,
                 logger=None, ext='.bin'):
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.root_path = root_path
        self.ext = ext
        data_file_list = glob.glob(str(root_path / f'*{self.ext}')) \
            if root_path.is_dir() else [str(root_path)]
        self.sample_file_list = sorted(data_file_list)

    def __len__(self):
        return len(self.sample_file_list)

    def __getitem__(self, index):
        if self.ext == '.bin':
            points = np.fromfile(self.sample_file_list[index], dtype=np.float32).reshape(-1, 4)
        elif self.ext == '.npy':
            points = np.load(self.sample_file_list[index])
        else:
            raise NotImplementedError
        input_dict = {'points': points, 'frame_id': index}
        return self.prepare_data(data_dict=input_dict)


def main():
    parser = argparse.ArgumentParser(description='arg parser')
    parser.add_argument('--cfg_file', type=str,
                        default='configs/kitti_models/pdm_ssd.yaml')
    parser.add_argument('--data_path', type=str, required=True,
                        help='point cloud file or directory')
    parser.add_argument('--ckpt', type=str, default=None)
    parser.add_argument('--ext', type=str, default='.bin')
    parser.add_argument('--vis', type=str, default='3d',
                        choices=['3d', 'bev', 'none'],
                        help='scene render per frame (matplotlib 3d '
                             'wireframes / BEV / off); open3d is used '
                             'automatically when installed')
    parser.add_argument('--save_dir', type=str, default=None,
                        help='dump pred boxes as .npy here')
    args = parser.parse_args()

    import jax
    # persistent XLA compile cache: CLI restarts skip the 8-17 min
    # sparse-graph compiles (same config the benches already use)
    jax.config.update('jax_compilation_cache_dir',
                      str(REPO / '.jax_cache'))
    jax.config.update('jax_persistent_cache_min_compile_time_secs',
                      2.0)
    from pdm_ssd_tpu.models import build_network, get_host_prepare
    from pdm_ssd_tpu.runtime import trainer

    cfg = cfg_from_yaml_file(args.cfg_file, CfgNode())
    logger = common_utils.create_logger()
    logger.info('-----------------PDM-SSD TPU demo-------------------------')
    demo_dataset = DemoDataset(
        dataset_cfg=cfg.DATA_CONFIG, class_names=cfg.CLASS_NAMES, training=False,
        root_path=Path(args.data_path), ext=args.ext, logger=logger)
    logger.info(f'Total number of samples: \t{len(demo_dataset)}')

    model = build_network(model_cfg=cfg.MODEL, num_class=len(cfg.CLASS_NAMES),
                          dataset_cfg=cfg.DATA_CONFIG,
                          class_names=cfg.CLASS_NAMES)
    host_prepare = get_host_prepare(cfg.MODEL, cfg.DATA_CONFIG) or (lambda b: b)
    example = host_prepare(demo_dataset.collate_batch([demo_dataset[0]]))
    state, tx, _ = trainer.create_train_state(
        model, trainer._filter_device_batch(example), cfg.OPTIMIZATION, 1, 1)
    if args.ckpt:
        ckpt_manager = trainer.make_checkpoint_manager(str(Path(args.ckpt).resolve()))
        state, step = trainer.restore_checkpoint(ckpt_manager, state)
        logger.info(f'loaded checkpoint step {step}')

    predict = trainer.make_predict_step(model)
    for idx in range(len(demo_dataset)):
        batch = host_prepare(demo_dataset.collate_batch([demo_dataset[idx]]))
        dets = jax.device_get(predict(state.params, state.batch_stats,
                                      trainer._filter_device_batch(batch)))
        mask = dets['pred_mask'][0]
        boxes = dets['pred_boxes'][0][mask]
        scores = dets['pred_scores'][0][mask]
        labels = dets['pred_labels'][0][mask]
        logger.info(f'frame {idx}: {mask.sum()} detections')
        for b, s, l in zip(boxes, scores, labels):
            logger.info('  %-12s score %.3f box [%.1f %.1f %.1f %.1f %.1f %.1f %.2f]'
                        % (cfg.CLASS_NAMES[int(l) - 1], s, *b[:7]))
        if args.save_dir:
            out = Path(args.save_dir)
            out.mkdir(parents=True, exist_ok=True)
            np.save(out / f'frame_{idx}_boxes.npy',
                    np.concatenate([boxes[:, :7], scores[:, None], labels[:, None]], axis=1))
        if args.vis != 'none':
            sys.path.insert(0, str(REPO / 'tools'))
            from visual_utils.visualize_utils import draw_scenes
            pts = np.asarray(batch['points'][0])
            if 'points_mask' in batch:
                pts = pts[np.asarray(batch['points_mask'][0])]
            png = draw_scenes(pts, ref_boxes=boxes[:, :7], ref_scores=scores,
                              save_path=f'demo_frame_{idx}_{args.vis}.png',
                              mode=args.vis)
            logger.info(f'  scene render -> {png}')
    logger.info('Demo done.')


if __name__ == '__main__':
    main()
