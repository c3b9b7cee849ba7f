"""GT-database sampling ("copy-paste") augmentation (host-side numpy).

Re-implementation of `DataBaseSampler`
(`pcdet/datasets/augmentor/database_sampler.py`): per-class round-robin
sampling with reshuffle (:130-147), difficulty/min-points filtering (:101-128),
BEV-IoU collision rejection against existing + already-sampled boxes (:471-476),
scene-point removal inside sampled boxes + object-point concatenation
(:429-436). Rotated-IoU collision math is the numpy mirror in
`pdm_ssd_tpu.utils.np_iou` (role of `iou3d_cpu.cpp`).
"""
from __future__ import annotations

import pickle
from pathlib import Path

import numpy as np

from ...utils import np_iou


class DataBaseSampler(object):
    def __init__(self, root_path, sampler_cfg, class_names, logger=None):
        self.root_path = Path(root_path)
        self.class_names = class_names
        self.sampler_cfg = sampler_cfg
        self.logger = logger

        self.db_infos = {}
        for class_name in class_names:
            self.db_infos[class_name] = []
        for db_info_path in sampler_cfg.DB_INFO_PATH:
            db_info_path = self.root_path.resolve() / db_info_path
            if not db_info_path.exists():
                if logger is not None:
                    logger.warning(f'DB info not found: {db_info_path}')
                continue
            with open(str(db_info_path), 'rb') as f:
                infos = pickle.load(f)
                for cur_class in class_names:
                    if cur_class in infos:
                        self.db_infos[cur_class].extend(infos[cur_class])

        for func_name, val in sampler_cfg.get('PREPARE', {}).items():
            self.db_infos = getattr(self, func_name)(self.db_infos, val)

        self.sample_groups = {}
        self.sample_class_num = {}
        self.limit_whole_scene = sampler_cfg.get('LIMIT_WHOLE_SCENE', False)
        for x in sampler_cfg.SAMPLE_GROUPS:
            class_name, sample_num = x.split(':')
            if class_name not in class_names:
                continue
            self.sample_class_num[class_name] = sample_num
            self.sample_groups[class_name] = {
                'sample_num': sample_num,
                'pointer': len(self.db_infos[class_name]),
                'indices': np.arange(len(self.db_infos[class_name])),
            }

    def filter_by_difficulty(self, db_infos, removed_difficulty):
        new_db_infos = {}
        for key, dinfos in db_infos.items():
            new_db_infos[key] = [info for info in dinfos
                                 if info['difficulty'] not in removed_difficulty]
        return new_db_infos

    def filter_by_min_points(self, db_infos, min_gt_points_list):
        for name_num in min_gt_points_list:
            name, min_num = name_num.split(':')
            min_num = int(min_num)
            if min_num > 0 and name in db_infos:
                db_infos[name] = [info for info in db_infos[name]
                                  if info['num_points_in_gt'] >= min_num]
        return db_infos

    def sample_with_fixed_number(self, class_name, sample_group):
        """Round-robin with reshuffle (`database_sampler.py:130-147`)."""
        sample_num = int(sample_group['sample_num'])
        pointer, indices = sample_group['pointer'], sample_group['indices']
        total = len(self.db_infos[class_name])
        if total == 0:
            return []
        if pointer >= total:
            indices = np.random.permutation(total)
            pointer = 0
        sampled = [self.db_infos[class_name][idx]
                   for idx in indices[pointer:pointer + sample_num]]
        sample_group['pointer'] = pointer + sample_num
        sample_group['indices'] = indices
        return sampled

    @staticmethod
    def remove_points_in_boxes(points, boxes):
        """Drop scene points inside the sampled boxes (numpy rotation test)."""
        if len(boxes) == 0 or len(points) == 0:
            return points
        shift = points[:, None, 0:3] - boxes[None, :, 0:3]
        cosa = np.cos(-boxes[:, 6])
        sina = np.sin(-boxes[:, 6])
        lx = shift[..., 0] * cosa[None] - shift[..., 1] * sina[None]
        ly = shift[..., 0] * sina[None] + shift[..., 1] * cosa[None]
        inside = ((np.abs(shift[..., 2]) <= boxes[None, :, 5] / 2)
                  & (np.abs(lx) < boxes[None, :, 3] / 2)
                  & (np.abs(ly) < boxes[None, :, 4] / 2))
        return points[~inside.any(axis=1)]

    def add_sampled_boxes_to_scene(self, data_dict, sampled_gt_boxes, total_valid_sampled_dict):
        gt_boxes = data_dict['gt_boxes']
        gt_names = data_dict['gt_names']
        points = data_dict['points']

        obj_points_list = []
        kept_boxes, kept_names = [], []
        for idx, info in enumerate(total_valid_sampled_dict):
            file_path = self.root_path / info['path']
            if not file_path.exists():
                continue
            obj_points = np.fromfile(str(file_path), dtype=np.float32).reshape(
                -1, self.sampler_cfg.NUM_POINT_FEATURES)
            if obj_points.shape[0] != info['num_points_in_gt']:
                obj_points = obj_points.reshape(-1, self.sampler_cfg.NUM_POINT_FEATURES)
            obj_points = obj_points.copy()
            obj_points[:, :3] += info['box3d_lidar'][:3].astype(np.float32)
            obj_points_list.append(obj_points)
            kept_boxes.append(sampled_gt_boxes[idx])
            kept_names.append(info['name'])

        if len(obj_points_list) == 0:
            return data_dict
        obj_points = np.concatenate(obj_points_list, axis=0)
        sampled_gt_boxes = np.stack(kept_boxes, axis=0)
        sampled_gt_names = np.array(kept_names)

        points = self.remove_points_in_boxes(points, sampled_gt_boxes)
        data_dict['points'] = np.concatenate([obj_points[:, :points.shape[1]], points], axis=0)
        data_dict['gt_boxes'] = np.concatenate([gt_boxes, sampled_gt_boxes[:, :gt_boxes.shape[1]]], axis=0)
        data_dict['gt_names'] = np.concatenate([gt_names, sampled_gt_names], axis=0)
        return data_dict

    def __call__(self, data_dict):
        """Sample objects per class, reject BEV-IoU collisions, paste into scene
        (`database_sampler.py:445-502`)."""
        gt_boxes = data_dict['gt_boxes']
        gt_names = data_dict['gt_names'].astype(str)
        existed_boxes = gt_boxes
        total_valid_sampled_dict = []

        for class_name, sample_group in self.sample_groups.items():
            if self.limit_whole_scene:
                num_gt = np.sum(class_name == gt_names)
                sample_group['sample_num'] = str(
                    max(int(self.sample_class_num[class_name]) - num_gt, 0))
            if int(sample_group['sample_num']) > 0:
                sampled_dict = self.sample_with_fixed_number(class_name, sample_group)
                if len(sampled_dict) == 0:
                    continue
                sampled_boxes = np.stack(
                    [x['box3d_lidar'] for x in sampled_dict], axis=0).astype(np.float32)

                iou1 = np_iou.boxes_bev_iou_cpu(sampled_boxes[:, 0:7], existed_boxes[:, 0:7]) \
                    if len(existed_boxes) else np.zeros((len(sampled_boxes), 0), np.float32)
                iou2 = np_iou.boxes_bev_iou_cpu(sampled_boxes[:, 0:7], sampled_boxes[:, 0:7])
                iou2[range(len(sampled_boxes)), range(len(sampled_boxes))] = 0
                iou1 = iou1 if iou1.shape[1] > 0 else iou2
                valid_mask = ((iou1.max(axis=1) + iou2.max(axis=1)) == 0).nonzero()[0]
                valid_sampled_dict = [sampled_dict[x] for x in valid_mask]
                valid_sampled_boxes = sampled_boxes[valid_mask]

                existed_boxes = np.concatenate(
                    (existed_boxes, valid_sampled_boxes[:, :existed_boxes.shape[1]]), axis=0)
                total_valid_sampled_dict.extend(valid_sampled_dict)

        sampled_gt_boxes = existed_boxes[gt_boxes.shape[0]:, :]
        if total_valid_sampled_dict.__len__() > 0:
            data_dict = self.add_sampled_boxes_to_scene(
                data_dict, sampled_gt_boxes, total_valid_sampled_dict)
        return data_dict
