"""Config-driven host-side data processing queue.

Covers the role of `pcdet/datasets/processor/data_processor.py` (range
masking, shuffling, the near/far-aware fixed-N point sampler — how point
models get static TPU shapes — and voxelization) with a different design:
each config entry resolves to a `_build_<NAME>` factory returning a bound
step closure; there is no shared mutable step signature. Voxelization is a
numpy grid hash (native C++ fast path in `csrc`) instead of spconv.
"""
from __future__ import annotations

import numpy as np

from ...ops import box_ops


class DataProcessor:
    def __init__(self, processor_configs, point_cloud_range, training,
                 num_point_features):
        self.point_cloud_range = np.asarray(point_cloud_range, np.float32)
        self.training = training
        self.num_point_features = num_point_features
        self.mode = 'train' if training else 'test'
        self.grid_size = None
        self.voxel_size = None
        self.steps = [getattr(self, f'_build_{cfg.NAME}')(cfg)
                      for cfg in processor_configs]

    def forward(self, data_dict: dict) -> dict:
        for step in self.steps:
            data_dict = step(data_dict)
        return data_dict

    def _set_grid(self, voxel_size):
        extent = self.point_cloud_range[3:6] - self.point_cloud_range[0:3]
        self.voxel_size = voxel_size
        self.grid_size = np.round(extent / np.asarray(voxel_size)).astype(np.int64)

    # ---- step factories (names are the config NAME keys) ----

    def _build_mask_points_and_boxes_outside_range(self, cfg):
        filter_boxes = cfg.REMOVE_OUTSIDE_BOXES and self.training
        min_corners = cfg.get('min_num_corners', 1)
        center_filter = cfg.get('USE_CENTER_TO_FILTER', True)

        def step(dd):
            pts = dd.get('points')
            if pts is not None:
                dd['points'] = pts[box_ops.mask_points_by_range(
                    pts, self.point_cloud_range)]
            if filter_boxes and dd.get('gt_boxes') is not None:
                keep = box_ops.mask_boxes_outside_range_numpy(
                    dd['gt_boxes'], self.point_cloud_range,
                    min_num_corners=min_corners,
                    use_center_to_filter=center_filter)
                dd['gt_boxes'] = dd['gt_boxes'][keep]
                if 'gt_names' in dd:
                    dd['gt_names'] = dd['gt_names'][keep]
            return dd
        return step

    def _build_shuffle_points(self, cfg):
        enabled = cfg.SHUFFLE_ENABLED[self.mode]

        def step(dd):
            if enabled:
                dd['points'] = dd['points'][
                    np.random.permutation(len(dd['points']))]
            return dd
        return step

    def _build_sample_points(self, cfg):
        """Fixed-N sampler. Over budget: keep all far (>=40 m) points, fill
        with random near points; under budget: pad with random duplicates;
        always reshuffle (reference `sample_points` semantics)."""
        n_want = cfg.NUM_POINTS[self.mode]

        def step(dd):
            if n_want == -1:
                return dd
            points = dd['points']
            n_have = len(points)
            if n_have == 0:
                # an aggressive aug (e.g. a flip on a forward-only range)
                # can empty the cloud; emit all-zero padding rather than
                # crash — downstream masks treat zero rows as padding
                dd['points'] = np.zeros((n_want, points.shape[1]),
                                        points.dtype)
                return dd
            if n_want >= n_have:
                n_pad = n_want - n_have
                pad = np.random.choice(n_have, n_pad, replace=n_pad > n_have)
                keep = np.concatenate([np.arange(n_have), pad])
            else:
                is_far = np.linalg.norm(points[:, :3], axis=1) >= 40.0
                far = np.flatnonzero(is_far)
                if len(far) < n_want:
                    near = np.flatnonzero(~is_far)
                    fill = np.random.choice(near, n_want - len(far),
                                            replace=False)
                    keep = np.concatenate([far, fill])
                else:
                    keep = np.random.choice(n_have, n_want, replace=False)
            np.random.shuffle(keep)
            dd['points'] = points[keep]
            return dd
        return step

    def _build_calculate_grid_size(self, cfg):
        self._set_grid(cfg.VOXEL_SIZE)
        return lambda dd: dd

    def _build_transform_points_to_voxels(self, cfg):
        """Point -> voxel grid hash: first MAX_POINTS_PER_VOXEL points per
        occupied cell, capped cell count, zyx coords (spconv layout)."""
        self._set_grid(cfg.VOXEL_SIZE)
        self.max_num_voxels = cfg.MAX_NUMBER_OF_VOXELS[self.mode]
        max_voxels = self.max_num_voxels
        max_pts = cfg.MAX_POINTS_PER_VOXEL
        vs = np.asarray(cfg.VOXEL_SIZE, np.float32)

        def step(dd):
            points = dd['points']
            native = self._native_voxelize(points, vs, max_pts, max_voxels)
            if native is None:
                native = self._numpy_voxelize(points, vs, max_pts, max_voxels)
            dd['voxels'], dd['voxel_coords'], dd['voxel_num_points'] = native
            return dd
        return step

    def _build_generate_depth_map(self, cfg):
        """Lidar -> image-plane depth map for CaDDN's DDN supervision:
        project points through the calib, keep the nearest depth per pixel
        (the reference ships precomputed depth_maps; here they are derived
        in-pipeline from the same lidar frame)."""
        shape = cfg.get('MAP_SHAPE', None)        # (H, W) or None -> image

        def step(dd):
            calib = dd.get('calib')
            pts = dd.get('points')
            if calib is None or pts is None:
                return dd
            H, W = shape if shape is not None else dd['image_shape']
            rect = calib.lidar_to_rect(pts[:, :3])
            uv, depth = calib.rect_to_img(rect)
            u = np.floor(uv[:, 0]).astype(np.int64)
            v = np.floor(uv[:, 1]).astype(np.int64)
            ok = (depth > 0) & (u >= 0) & (u < W) & (v >= 0) & (v < H)
            dm = np.full((H * W,), 0.0, np.float32)
            flat = v[ok] * W + u[ok]
            order = np.argsort(-depth[ok], kind='stable')
            dm[flat[order]] = depth[ok][order]    # nearest point wins
            dd['depth_maps'] = dm.reshape(H, W)
            return dd
        return step

    def _build_downsample_depth_map(self, cfg):
        """`data_processor.py:222` (`downscale_local_mean`): block-mean
        downsample of the depth map to the feature resolution."""
        f = int(cfg.DOWNSAMPLE_FACTOR)
        self.depth_downsample_factor = f

        def step(dd):
            dm = dd.get('depth_maps')
            if dm is None:
                return dd
            H, W = dm.shape
            Hp, Wp = (H + f - 1) // f * f, (W + f - 1) // f * f
            pad = np.zeros((Hp, Wp), dm.dtype)
            pad[:H, :W] = dm
            dd['depth_maps'] = pad.reshape(Hp // f, f, Wp // f, f).mean((1, 3))
            return dd
        return step

    def _build_image_normalize(self, cfg):
        """`data_processor.py:233-245`: PIL camera images -> normalized
        float array. Channels-last (N_cam, H, W, 3) instead of the
        reference's list of CHW tensors — the TPU image stack is NHWC."""
        mean = np.asarray(cfg.mean, np.float32)
        std = np.asarray(cfg.std, np.float32)

        def step(dd):
            imgs = dd.get('camera_imgs')
            if imgs is None:
                return dd
            arrs = [(np.asarray(im, np.float32) / 255.0 - mean) / std
                    for im in imgs]
            dd['camera_imgs'] = np.stack(arrs).astype(np.float32)
            return dd
        return step

    def _build_image_calibrate(self, cfg):
        """`data_processor.py:247-281`: fold each image's recorded
        resize/crop/flip/rotate (`img_process_infos`) into a 4x4
        post-homography `img_aug_matrix` consumed by DepthLSSTransform."""
        def step(dd):
            infos = dd.get('img_process_infos')
            if infos is None:
                return dd
            transforms = []
            for resize, crop, flip, rotate in infos:
                rot = np.eye(2) * resize
                tra = -np.asarray(crop[:2], np.float64)
                if flip:
                    A = np.array([[-1.0, 0.0], [0.0, 1.0]])
                    b = np.array([crop[2] - crop[0], 0.0])
                    rot = A @ rot
                    tra = A @ tra + b
                theta = rotate / 180.0 * np.pi
                A = np.array([[np.cos(theta), np.sin(theta)],
                              [-np.sin(theta), np.cos(theta)]])
                b = np.array([crop[2] - crop[0], crop[3] - crop[1]]) / 2.0
                b = A @ (-b) + b
                rot = A @ rot
                tra = A @ tra + b
                tf = np.eye(4, dtype=np.float32)
                tf[:2, :2] = rot
                tf[:2, 3] = tra
                transforms.append(tf)
            dd['img_aug_matrix'] = np.stack(transforms)
            return dd
        return step

    def _build_generate_camera_depth(self, cfg):
        """Sparse per-camera lidar depth maps, host-side: inverse-lidar-aug
        the points, project through lidar2image, then the recorded image aug
        — the same chain the reference runs in-model
        (`view_transforms/depth_lss.py:206-243`), moved to the host so the
        device graph stays fixed-shape. Output 'camera_depth'
        (N_cam, iH, iW, 1)."""
        iH, iW = (int(v) for v in cfg.IMAGE_DIM)

        def step(dd):
            if 'lidar2image' not in dd:
                return dd
            pts = dd['points'][:, :3].astype(np.float64)
            la = dd.get('lidar_aug_matrix', np.eye(4))
            pts = (pts - la[:3, 3]) @ np.linalg.inv(la[:3, :3]).T
            l2i = dd['lidar2image']                       # (N_cam, 4, 4)
            aug = dd.get('img_aug_matrix',
                         np.broadcast_to(np.eye(4), l2i.shape))
            n_cam = l2i.shape[0]
            depth = np.zeros((n_cam, iH, iW, 1), np.float32)
            hom = np.concatenate([pts, np.ones((len(pts), 1))], -1)
            for c in range(n_cam):
                uvw = hom @ l2i[c].T                      # (N, 4)
                dist = uvw[:, 2]
                w = np.clip(uvw[:, 2], 1e-5, 1e5)
                coords = np.stack([uvw[:, 0] / w, uvw[:, 1] / w,
                                   np.ones_like(w)], -1)
                coords = coords @ aug[c][:3, :3].T + aug[c][:3, 3]
                u, v = coords[:, 0], coords[:, 1]
                on = (u >= 0) & (u < iW) & (v >= 0) & (v < iH) & (dist > 0)
                depth[c, v[on].astype(int), u[on].astype(int), 0] = dist[on]
            dd['camera_depth'] = depth
            return dd
        return step

    def _native_voxelize(self, points, vs, max_pts, max_voxels):
        try:
            from ...csrc import voxelize
            return voxelize(points, vs, self.point_cloud_range[0:3],
                            self.grid_size.astype(np.int32), max_pts, max_voxels)
        except Exception:
            return None

    def _numpy_voxelize(self, points, vs, max_pts, max_voxels):
        cells = np.floor(
            (points[:, :3] - self.point_cloud_range[0:3]) / vs).astype(np.int64)
        ok = np.all((cells >= 0) & (cells < self.grid_size), axis=1)
        points, cells = points[ok], cells[ok]
        flat = (cells[:, 2] * self.grid_size[1] + cells[:, 1]) \
            * self.grid_size[0] + cells[:, 0]
        order = np.argsort(flat, kind='stable')
        points, cells, flat = points[order], cells[order], flat[order]
        _, starts, counts = np.unique(flat, return_index=True, return_counts=True)
        n_vox = min(len(starts), max_voxels)
        fill = np.minimum(counts[:n_vox], max_pts).astype(np.int32)
        voxels = np.zeros((n_vox, max_pts, points.shape[1]), points.dtype)
        for i in range(n_vox):
            voxels[i, :fill[i]] = points[starts[i]:starts[i] + fill[i]]
        return voxels, cells[starts[:n_vox]][:, ::-1], fill
