"""Generic config-assembled detector (module-topology template).

The flax analog of `Detector3DTemplate.build_networks`
(`pcdet/models/detectors/detector3d_template.py:23-173`): a detector is the
composition of optional module slots selected by config blocks —

    VFE -> MAP_TO_BEV -> BACKBONE_2D -> DENSE_HEAD

which covers the pillar/voxel single-stage family (PointPillar, SECOND-style,
CenterPoint) as pure configuration. Post-processing mirrors
`detector3d_template.post_processing:178-284` (sigmoid + class-agnostic NMS)
with fixed-shape outputs.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops.selection import two_stage_topk
from .. import model_nms
from ...utils.config import as_cfg
from ..backbones_2d.base_bev_backbone import BaseBEVBackbone, BaseBEVResBackbone
from ..backbones_2d.map_to_bev import Conv2DCollapse, HeightCompression, PointPillarScatter
from ..backbones_3d.vfe import DynamicPillarVFE, MeanVFE, PillarVFE
from ..backbones_3d.voxel_backbone import DenseVoxelBackBone8x
from ..backbones_3d.grid_point_backbone import GridPointBackbone
from ..dense_heads.anchor_head import AnchorHeadMulti, AnchorHeadSingle
from ..dense_heads.center_head import CenterHead


def build_voxel_backbone_3d(bb_cfg, input_channels, grid_size,
                            voxel_size=None, pc_range=None):
    """Name-dispatched voxel BACKBONE_3D builder (reference
    `detector3d_template.build_backbone_3d:74-88` selects by NAME).
    Shared by the generic `Detector3D` and the explicit two-stage
    assemblies (PV-RCNN / Voxel R-CNN / SECOND-IoU / MPPNet) so that any
    of them can run the sparse 0.05 m ladder by config alone."""
    name = bb_cfg.get('NAME', 'VoxelBackBone8x')
    if name in ('SparseVoxelBackBone8x', 'SparseVoxelResBackBone8x'):
        from ..backbones_3d.sparse_backbone import SparseVoxelBackBone8x
        return SparseVoxelBackBone8x(
            model_cfg=bb_cfg, input_channels=input_channels,
            grid_size=grid_size,
            residual=(name == 'SparseVoxelResBackBone8x'))
    if name == 'VoxelBackBone8xFocal':
        from ..backbones_3d.sparse_backbone_focal import VoxelBackBone8xFocal
        return VoxelBackBone8xFocal(
            model_cfg=bb_cfg, input_channels=input_channels,
            grid_size=grid_size, voxel_size=voxel_size, point_cloud_range=pc_range)
    return DenseVoxelBackBone8x(model_cfg=bb_cfg,
                                input_channels=input_channels,
                                grid_size=grid_size)


def _grid_info(ds_cfg):
    """grid size (W, H, D) + voxel size from the dataset processor config
    (reference threads these through `model_info_dict`)."""
    pc = np.asarray(ds_cfg.POINT_CLOUD_RANGE, np.float32)
    voxel = None
    for proc in ds_cfg.get('DATA_PROCESSOR', []):
        if 'VOXEL_SIZE' in proc:
            voxel = np.asarray(proc.VOXEL_SIZE, np.float32)
    if voxel is None:
        voxel = np.asarray([0.16, 0.16, 4.0], np.float32)
    grid = np.round((pc[3:6] - pc[0:3]) / voxel).astype(int)
    return tuple(int(g) for g in grid), tuple(float(v) for v in voxel)


class Detector3D(nn.Module):
    model_cfg: Any
    num_class: int
    dataset_cfg: Any
    class_names: Any = None

    def setup(self):
        cfg = as_cfg(self.model_cfg)
        ds = as_cfg(self.dataset_cfg)
        pc_range = tuple(ds.POINT_CLOUD_RANGE)
        num_pf = ds.get('NUM_POINT_FEATURES', 4)
        (gw, gh, gd), voxel = _grid_info(ds)
        self._grid = (gw, gh, gd)
        self._voxel = voxel
        self._pc_range = pc_range

        modules = []
        if cfg.get('VFE') is not None:
            name = cfg.VFE.NAME
            if name == 'PillarVFE':
                vfe = PillarVFE(model_cfg=cfg.VFE, num_point_features=num_pf,
                                voxel_size=voxel, point_cloud_range=pc_range)
            elif name == 'DynamicPillarVFE':
                vfe = DynamicPillarVFE(model_cfg=cfg.VFE, num_point_features=num_pf,
                                       voxel_size=voxel, point_cloud_range=pc_range,
                                       grid_size=(gw, gh))
            else:
                vfe = MeanVFE(model_cfg=cfg.VFE, num_point_features=num_pf)
            modules.append(vfe)
            vfe_out = vfe.get_output_feature_dim()
        else:
            vfe_out = num_pf

        if cfg.get('BACKBONE_3D') is not None:
            bb_name = cfg.BACKBONE_3D.get('NAME')
            if bb_name == 'GridPointBackbone':
                bb3d = GridPointBackbone(model_cfg=cfg.BACKBONE_3D,
                                         input_channels=num_pf,
                                         pc_range=pc_range)
                vfe_out = bb3d.num_point_features
            else:
                bb3d = build_voxel_backbone_3d(
                    cfg.BACKBONE_3D, vfe_out, (gw, gh, gd),
                    voxel_size=voxel, pc_range=pc_range)
                vfe_out = bb3d.num_bev_features
            modules.append(bb3d)

        if cfg.get('MAP_TO_BEV') is not None:
            name = cfg.MAP_TO_BEV.NAME
            m2b_cls = {'PointPillarScatter': PointPillarScatter,
                       'HeightCompression': HeightCompression,
                       'Conv2DCollapse': Conv2DCollapse}[name]
            kwargs = {'model_cfg': cfg.MAP_TO_BEV}
            if name == 'PointPillarScatter':
                kwargs['grid_size'] = (gw, gh)
            m2b = m2b_cls(**kwargs)
            modules.append(m2b)
            bev_in = m2b.num_bev_features
        else:
            bev_in = vfe_out

        if cfg.get('BACKBONE_2D') is not None:
            name2d = cfg.BACKBONE_2D.get('NAME')
            if name2d == 'BaseBEVResBackbone':
                bb_cls = BaseBEVResBackbone
            elif name2d == 'DSVTBackbone':
                from ..backbones_2d.dsvt_backbone import DSVTBackbone
                bb_cls = DSVTBackbone
            else:
                bb_cls = BaseBEVBackbone
            bb = bb_cls(model_cfg=cfg.BACKBONE_2D, input_channels=bev_in)
            modules.append(bb)
            head_in = bb.num_bev_features
        else:
            head_in = bev_in

        head_cfg = cfg.DENSE_HEAD
        stride = head_cfg.TARGET_ASSIGNER_CONFIG.get('FEATURE_MAP_STRIDE', 2) \
            if 'TARGET_ASSIGNER_CONFIG' in head_cfg else 2
        fmap = (gw // stride, gh // stride)
        if head_cfg.NAME == 'CenterHead':
            self.dense_head = CenterHead(
                model_cfg=head_cfg, input_channels=head_in, num_class=self.num_class,
                grid_size=fmap, point_cloud_range=pc_range,
                voxel_size=voxel[:2],
                class_names=tuple(self.class_names) if self.class_names else None)
        elif head_cfg.NAME == 'VoxelNeXtHead':
            from ..dense_heads.voxelnext_head import VoxelNeXtHead
            self.dense_head = VoxelNeXtHead(
                model_cfg=head_cfg, input_channels=head_in,
                num_class=self.num_class, point_cloud_range=pc_range,
                voxel_size=voxel[:2],
                class_names=tuple(self.class_names) if self.class_names else None)
        elif head_cfg.NAME == 'TransFusionHead':
            from ..dense_heads.transfusion_head import TransFusionHead
            self.dense_head = TransFusionHead(
                model_cfg=head_cfg, input_channels=head_in,
                num_class=self.num_class, grid_size=fmap,
                point_cloud_range=pc_range, voxel_size=voxel[:2],
                class_names=tuple(self.class_names) if self.class_names else None)
        else:
            head_cls = AnchorHeadMulti if head_cfg.NAME == 'AnchorHeadMulti' \
                else AnchorHeadSingle
            self.dense_head = head_cls(
                model_cfg=head_cfg, input_channels=head_in, num_class=self.num_class,
                class_names=self.class_names, grid_size=fmap,
                point_cloud_range=pc_range)
        self.module_list = modules

    def __call__(self, batch: dict, training: bool = False) -> dict:
        batch = dict(batch)
        for m in self.module_list:
            batch = m(batch, training=training)
        from ..dense_heads.voxelnext_head import VoxelNeXtHead
        if isinstance(self.dense_head, VoxelNeXtHead):
            return self.dense_head(batch, training=training)
        if 'spatial_features_2d' not in batch:
            # no 2D backbone configured (VoxelNeXt-style): the head reads the
            # 3D backbone's compressed BEV map directly
            batch['spatial_features_2d'] = batch['spatial_features']
        batch = self.dense_head(batch, training=training)
        return batch

    def forward_with_loss(self, batch: dict, training: bool = True):
        out = self(batch, training=training)
        loss, tb = self.get_training_loss(out)
        return loss, tb

    def predict(self, batch: dict) -> dict:
        """POST_PROCESSING.TTA_FLIP (e.g. ['x', 'y', 'xy']) enables the
        voxel-family DOUBLE_FLIP TTA (reference `data_processor.py:133` +
        CenterPoint's `merge_double_flip`): the scene is mirrored in-graph
        (points, raw voxel points and grid coords), each variant runs the
        full model, detections are mirrored back and merged by one joint
        NMS — a det-level recast of the reference's heatmap-mean merge."""
        pp = as_cfg(self.model_cfg).POST_PROCESSING
        flips = list(pp.get('TTA_FLIP', []))
        det = self.post_process(self(batch, training=False))
        if not flips:
            return det

        gw, gh, _ = self._grid
        dets = [det]
        for axes in flips:
            fb = dict(batch)
            for col in ([0] if axes == 'x' else [1] if axes == 'y'
                        else [0, 1]):
                if 'points' in fb:
                    fb['points'] = fb['points'].at[..., col].multiply(-1.0)
                if 'voxels' in fb:
                    fb['voxels'] = fb['voxels'].at[..., col].multiply(-1.0)
                if 'voxel_coords' in fb:
                    # zyx layout: col 2 = ix, col 1 = iy
                    ccol, dim = (2, gw) if col == 0 else (1, gh)
                    c = fb['voxel_coords']
                    fb['voxel_coords'] = c.at[..., ccol].set(
                        dim - 1 - c[..., ccol])
            fdet = self.post_process(self(fb, training=False))
            fboxes = fdet['pred_boxes']
            for col in ([0] if axes == 'x' else [1] if axes == 'y'
                        else [0, 1]):
                fboxes = fboxes.at[..., col].multiply(-1.0)
            if axes == 'y':
                fboxes = fboxes.at[..., 6].multiply(-1.0)
            elif axes == 'x':
                fboxes = fboxes.at[..., 6].set(jnp.pi - fboxes[..., 6])
            # xy: th -> th + pi handled by composing both rules
            elif axes == 'xy':
                fboxes = fboxes.at[..., 6].set(jnp.pi + fboxes[..., 6])
            dets.append({**fdet, 'pred_boxes': fboxes})

        boxes = jnp.concatenate([d['pred_boxes'] for d in dets], axis=1)
        scores = jnp.concatenate([d['pred_scores'] for d in dets], axis=1)
        labels = jnp.concatenate([d['pred_labels'] for d in dets], axis=1)
        valid = jnp.concatenate([d['pred_mask'] for d in dets], axis=1)
        nms_cfg = pp.NMS_CONFIG

        def per_sample(b, s, l, v):
            return model_nms.dispatch_nms(b, s, l, v, nms_cfg,
                                          self.num_class)

        fb_, fs_, fl_, fm_ = jax.vmap(per_sample)(boxes, scores, labels,
                                                  valid)
        return {'pred_boxes': fb_, 'pred_scores': fs_, 'pred_labels': fl_,
                'pred_mask': fm_}

    def get_training_loss(self, batch: dict):
        from ..dense_heads.voxelnext_head import VoxelNeXtHead
        if isinstance(self.dense_head, VoxelNeXtHead):
            targets = self.dense_head.assign_targets(
                batch['gt_boxes'], batch['gt_mask'],
                batch['sp_bev_coords'], batch['sp_bev_mask'])
            loss, tb = self.dense_head.get_loss(batch, targets)
            tb['loss'] = loss
            return loss, tb
        from ..dense_heads.transfusion_head import TransFusionHead
        if isinstance(self.dense_head, TransFusionHead):
            targets = self.dense_head.assign_targets(batch)
            loss, tb = self.dense_head.get_loss(batch, targets)
            tb['loss'] = loss
            return loss, tb
        if isinstance(self.dense_head, CenterHead):
            H, W = batch['spatial_features_2d'].shape[1:3]
            targets = self.dense_head.assign_targets(
                batch['gt_boxes'], batch['gt_mask'], (H, W))
        else:
            targets = self.dense_head.assign_targets(batch)
        loss, tb = self.dense_head.get_loss(batch, targets)
        if 'loss_box_of_pts' in batch:
            # focal sparse conv importance loss (reference
            # `spconv_backbone_focal.py:203-208,243`)
            loss = loss + batch['loss_box_of_pts']
            tb['loss_box_of_pts'] = batch['loss_box_of_pts']
        tb['loss'] = loss
        return loss, tb

    def post_process(self, batch: dict) -> dict:
        """Sigmoid + NMS (`detector3d_template.post_processing:178-284`):
        class-agnostic by default, `multi_classes_nms` / `class_specific_nms`
        via POST_PROCESSING.NMS_CONFIG.NMS_TYPE (`model_nms_utils.py:28-108`)."""
        pp = as_cfg(self.model_cfg).POST_PROCESSING
        nms_cfg = pp.NMS_CONFIG
        nms_type = nms_cfg.get('NMS_TYPE', 'nms_bev')
        cls_probs = None
        from ..dense_heads.transfusion_head import TransFusionHead
        if isinstance(self.dense_head, TransFusionHead):
            # query-based head: no NMS by design (reference TransFusion)
            out = self.dense_head.generate_predicted_boxes(batch)
            return {'pred_boxes': out['pred_boxes'],
                    'pred_scores': out['pred_scores'] * out['pred_mask'],
                    'pred_labels': (out['pred_labels'] + 1) * out['pred_mask'],
                    'pred_mask': out['pred_mask']}
        from ..dense_heads.voxelnext_head import VoxelNeXtHead
        if isinstance(self.dense_head, (CenterHead, VoxelNeXtHead)):
            hm = self.dense_head.generate_predicted_boxes(batch)
            boxes, scores = hm['pred_boxes'], hm['pred_scores']
            labels, valid = hm['pred_labels'] + 1, hm['pred_mask']
        else:
            cls_preds, boxes = self.dense_head.generate_predicted_boxes(batch)
            probs = jax.nn.sigmoid(cls_preds)                    # (B, A, nc)
            scores_all = jnp.max(probs, axis=-1)
            labels_all = jnp.argmax(probs, axis=-1) + 1
            K = min(int(np.max(nms_cfg.NMS_PRE_MAXSIZE)) * 2, scores_all.shape[1])
            scores, sel = two_stage_topk(scores_all, K)
            boxes = jnp.take_along_axis(boxes, sel[..., None], axis=1)
            labels = jnp.take_along_axis(labels_all, sel, axis=1)
            valid = jnp.ones_like(scores, bool)
            if nms_type == 'multi_classes_nms':
                cls_probs = jnp.take_along_axis(probs, sel[..., None], axis=1)

        valid = valid & (scores > pp.get('SCORE_THRESH', 0.1))

        def per_sample(b, s, l, v, cp=None):
            return model_nms.dispatch_nms(
                b, s, l, v, nms_cfg, self.num_class, cls_probs=cp,
                score_thresh=pp.get('SCORE_THRESH', 0.1)
                if nms_type in ('multi_classes_nms', 'class_specific_nms') else None)

        if cls_probs is not None:
            fb, fs, fl, fm = jax.vmap(per_sample)(boxes[..., :7], scores,
                                                  labels, valid, cls_probs)
        else:
            fb, fs, fl, fm = jax.vmap(per_sample)(boxes[..., :7], scores,
                                                  labels, valid)
        return {'pred_boxes': fb, 'pred_scores': fs, 'pred_labels': fl,
                'pred_mask': fm}
