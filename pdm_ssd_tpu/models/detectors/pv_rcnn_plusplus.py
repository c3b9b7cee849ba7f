"""PV-RCNN++: proposal-centric keypoints + VectorPool aggregation.

Re-design of the reference `PVRCNNPlusPlus`
(`pcdet/models/detectors/pv_rcnn_plusplus.py`): unlike PV-RCNN, the stage-1
proposals are generated FIRST, keypoint sampling is restricted to the
proposal neighborhoods (SPC sampling), and the raw-point source aggregates
with VectorPool (position-encoded subvoxel channels) instead of max-pool SA.
"""
from __future__ import annotations

from ...utils.config import as_cfg
from .pv_rcnn import PVRCNN


class PVRCNNPlusPlus(PVRCNN):

    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        batch = self.vfe(batch, training=training)
        batch = self.backbone_3d(batch, training=training)
        batch = self.backbone_2d(batch, training=training)
        batch = self.dense_head(batch, training=training)
        cls_preds, box_preds = self.dense_head.generate_predicted_boxes(batch)
        batch['batch_cls_preds'] = cls_preds
        batch['batch_box_preds'] = box_preds
        # proposals BEFORE keypoint sampling (the ++ ordering)
        batch = self.roi_head.proposal_layer(batch, training=training)
        if training and 'gt_boxes' in batch:
            batch['roi_targets'] = self.roi_head.assign_targets(batch)
        batch = self.pfe(batch, training=training)
        if self.point_head is not None:
            batch = self.point_head(batch, training=training)
        batch = self.roi_head(batch, training=training, skip_proposals=True)
        return batch
