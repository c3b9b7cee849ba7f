"""MPPNet: multi-frame two-stage refinement over proposal trajectories.

Re-design of the reference `MPPNet` / `MPPNetE2E`
(`pcdet/models/detectors/mppnet.py`, `mppnet_e2e.py` + the memory-bank
variant): a single-frame first stage (dense voxel SECOND here, as in the
reference's CenterPoint stage-1) generates proposals; `MPPNetHead` refines
them against the ego-aligned multi-frame point stack. The E2E memory-bank
streaming variant maps onto the same head by feeding the rolling frame stack
through 'points_multi_frame' (host-side ring buffer — no in-graph state).
"""
from __future__ import annotations

from ...utils.config import as_cfg
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone
from ..backbones_3d.vfe import MeanVFE
from ..dense_heads.anchor_head import AnchorHeadSingle
from ..roi_heads.mppnet_head import MPPNetHead
from .detector3d import _grid_info, build_voxel_backbone_3d
from .pv_rcnn import PVRCNN


class MPPNet(PVRCNN):

    def setup(self):
        cfg = as_cfg(self.model_cfg)
        ds = as_cfg(self.dataset_cfg)
        pc_range = tuple(ds.POINT_CLOUD_RANGE)
        num_pf = ds.get('NUM_POINT_FEATURES', 4)
        (gw, gh, gd), voxel = _grid_info(ds)

        self.vfe = MeanVFE(model_cfg=cfg.VFE, num_point_features=num_pf)
        self.backbone_3d = build_voxel_backbone_3d(
            cfg.BACKBONE_3D, num_pf, (gw, gh, gd),
            voxel_size=voxel, pc_range=pc_range)
        self.backbone_2d = BaseBEVBackbone(
            model_cfg=cfg.BACKBONE_2D,
            input_channels=self.backbone_3d.num_bev_features)
        stride = cfg.DENSE_HEAD.TARGET_ASSIGNER_CONFIG.get(
            'FEATURE_MAP_STRIDE', 8)
        self.dense_head = AnchorHeadSingle(
            model_cfg=cfg.DENSE_HEAD,
            input_channels=self.backbone_2d.num_bev_features,
            num_class=self.num_class, class_names=self.class_names,
            grid_size=(gw // stride, gh // stride), point_cloud_range=pc_range)
        self.pfe = None
        self.point_head = None
        self.roi_head = MPPNetHead(model_cfg=cfg.ROI_HEAD,
                                   num_class=self.num_class)

    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        if 'points_multi_frame' not in batch:
            # single-frame fallback: replicate the current frame T times
            import jax.numpy as jnp
            T = int(as_cfg(self.model_cfg).ROI_HEAD.get('NUM_FRAMES', 4))
            batch['points_multi_frame'] = jnp.repeat(
                batch['points'][:, None], T, axis=1)
        batch = self.vfe(batch, training=training)
        batch = self.backbone_3d(batch, training=training)
        batch = self.backbone_2d(batch, training=training)
        batch = self.dense_head(batch, training=training)
        cls_preds, box_preds = self.dense_head.generate_predicted_boxes(batch)
        batch['batch_cls_preds'] = cls_preds
        batch['batch_box_preds'] = box_preds
        batch = self.roi_head(batch, training=training)
        return batch

    def init_memory(self, batch_size: int, num_rois: int) -> dict:
        from ..roi_heads.mppnet_head import init_mppnet_memory
        return init_mppnet_memory(as_cfg(self.model_cfg).ROI_HEAD,
                                  batch_size, num_rois)

    def predict_with_state(self, batch: dict):
        """Streaming (MPPNetE2E) predict: consumes `batch['mppnet_memory']`,
        returns (detections, updated memory). Thread the memory through
        consecutive frames of a sequence; start from `init_memory(...)`.
        Recast of the reference's in-place memory-bank update
        (`pcdet/models/detectors/mppnet_e2e.py`)."""
        out = self(dict(batch), training=False)
        det = self.post_process(out)
        return det, out.get('mppnet_memory')

    def get_training_loss(self, batch: dict):
        a_targets = self.dense_head.assign_targets(batch)
        loss, tb = self.dense_head.get_loss(batch, a_targets)
        r_loss, tb3 = self.roi_head.get_loss(batch, batch['roi_targets'])
        loss = loss + r_loss
        tb = {**tb, **tb3, 'loss': loss}
        return loss, tb
