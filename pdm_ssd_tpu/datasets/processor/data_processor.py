"""Config-driven host-side data processing queue.

Parity with `pcdet/datasets/processor/data_processor.py:64-298` for the steps
the point-based pipeline needs: range masking, shuffling, and the near/far-aware
fixed-N point sampler (`sample_points:182-212` — this is how point models get
fixed TPU-friendly shapes). Voxelization steps are implemented as a simple
numpy grid hash (no spconv dependency) for voxel-based models.
"""
from __future__ import annotations

from functools import partial

import numpy as np

from ...ops import box_ops


class DataProcessor(object):
    def __init__(self, processor_configs, point_cloud_range, training, num_point_features):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.mode = 'train' if training else 'test'
        self.grid_size = self.voxel_size = None
        self.data_processor_queue = []
        for cur_cfg in processor_configs:
            cur_processor = getattr(self, cur_cfg.NAME)(config=cur_cfg)
            self.data_processor_queue.append(cur_processor)

    def mask_points_and_boxes_outside_range(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.mask_points_and_boxes_outside_range, config=config)
        if data_dict.get('points', None) is not None:
            mask = box_ops.mask_points_by_range(data_dict['points'], self.point_cloud_range)
            data_dict['points'] = data_dict['points'][mask]
        if data_dict.get('gt_boxes', None) is not None and config.REMOVE_OUTSIDE_BOXES and self.training:
            mask = box_ops.mask_boxes_outside_range_numpy(
                data_dict['gt_boxes'], self.point_cloud_range,
                min_num_corners=config.get('min_num_corners', 1),
                use_center_to_filter=config.get('USE_CENTER_TO_FILTER', True))
            data_dict['gt_boxes'] = data_dict['gt_boxes'][mask]
            if 'gt_names' in data_dict:
                data_dict['gt_names'] = data_dict['gt_names'][mask]
        return data_dict

    def shuffle_points(self, data_dict=None, config=None):
        if data_dict is None:
            return partial(self.shuffle_points, config=config)
        if config.SHUFFLE_ENABLED[self.mode]:
            points = data_dict['points']
            shuffle_idx = np.random.permutation(points.shape[0])
            data_dict['points'] = points[shuffle_idx]
        return data_dict

    def sample_points(self, data_dict=None, config=None):
        """Near/far-aware fixed-N sampler (`data_processor.py:182-212`):
        duplicates points when short, keeps far (>40 m) points when long."""
        if data_dict is None:
            return partial(self.sample_points, config=config)
        num_points = config.NUM_POINTS[self.mode]
        if num_points == -1:
            return data_dict

        points = data_dict['points']
        if num_points < len(points):
            pts_depth = np.linalg.norm(points[:, 0:3], axis=1)
            pts_near_flag = pts_depth < 40.0
            far_idxs_choice = np.where(pts_near_flag == 0)[0]
            near_idxs = np.where(pts_near_flag == 1)[0]
            if num_points > len(far_idxs_choice):
                near_idxs_choice = np.random.choice(
                    near_idxs, num_points - len(far_idxs_choice), replace=False)
                choice = np.concatenate((near_idxs_choice, far_idxs_choice), axis=0) \
                    if len(far_idxs_choice) > 0 else near_idxs_choice
            else:
                choice = np.arange(0, len(points), dtype=np.int32)
                choice = np.random.choice(choice, num_points, replace=False)
            np.random.shuffle(choice)
        else:
            choice = np.arange(0, len(points), dtype=np.int32)
            if num_points > len(points):
                extra_choice = np.random.choice(
                    choice, num_points - len(points),
                    replace=(num_points - len(points)) > len(points))
                choice = np.concatenate((choice, extra_choice), axis=0)
            np.random.shuffle(choice)
        data_dict['points'] = points[choice]
        return data_dict

    def calculate_grid_size(self, data_dict=None, config=None):
        if data_dict is None:
            grid_size = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) \
                / np.array(config.VOXEL_SIZE)
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            return partial(self.calculate_grid_size, config=config)
        return data_dict

    def transform_points_to_voxels(self, data_dict=None, config=None):
        """Numpy point->voxel hash (spconv-free stand-in for
        `VoxelGeneratorWrapper`, `data_processor.py:16-61`): first
        MAX_POINTS_PER_VOXEL points per occupied voxel, capped voxel count."""
        if data_dict is None:
            grid_size = (self.point_cloud_range[3:6] - self.point_cloud_range[0:3]) \
                / np.array(config.VOXEL_SIZE)
            self.grid_size = np.round(grid_size).astype(np.int64)
            self.voxel_size = config.VOXEL_SIZE
            self.max_num_voxels = config.MAX_NUMBER_OF_VOXELS[self.mode]
            return partial(self.transform_points_to_voxels, config=config)

        points = data_dict['points']
        vs = np.asarray(config.VOXEL_SIZE, np.float32)
        try:
            from ...csrc import voxelize as native_voxelize
            out = native_voxelize(
                points, vs, self.point_cloud_range[0:3],
                self.grid_size.astype(np.int32),
                config.MAX_POINTS_PER_VOXEL,
                config.MAX_NUMBER_OF_VOXELS[self.mode])
            if out is not None:
                data_dict['voxels'], data_dict['voxel_coords'], \
                    data_dict['voxel_num_points'] = out
                return data_dict
        except Exception:
            pass
        coords = np.floor((points[:, 0:3] - self.point_cloud_range[0:3]) / vs).astype(np.int64)
        valid = np.all((coords >= 0) & (coords < self.grid_size), axis=1)
        points, coords = points[valid], coords[valid]
        # zyx order like spconv
        keys = (coords[:, 2] * self.grid_size[1] + coords[:, 1]) * self.grid_size[0] + coords[:, 0]
        order = np.argsort(keys, kind='stable')
        keys, points, coords = keys[order], points[order], coords[order]
        uniq, first_idx, counts = np.unique(keys, return_index=True, return_counts=True)
        max_voxels = config.MAX_NUMBER_OF_VOXELS[self.mode]
        max_pts = config.MAX_POINTS_PER_VOXEL
        n_vox = min(len(uniq), max_voxels)
        voxels = np.zeros((n_vox, max_pts, points.shape[1]), points.dtype)
        voxel_num_points = np.minimum(counts[:n_vox], max_pts).astype(np.int32)
        voxel_coords = coords[first_idx[:n_vox]][:, ::-1]  # zyx
        for i in range(n_vox):
            s = first_idx[i]
            voxels[i, :voxel_num_points[i]] = points[s:s + voxel_num_points[i]]
        data_dict['voxels'] = voxels
        data_dict['voxel_coords'] = voxel_coords
        data_dict['voxel_num_points'] = voxel_num_points
        return data_dict

    def forward(self, data_dict):
        for cur_processor in self.data_processor_queue:
            data_dict = cur_processor(data_dict=data_dict)
        return data_dict
