"""VoxelNeXt sparse detection head (VERDICT r2 item 7).

Re-design of `pcdet/models/dense_heads/voxelnext_head.py` (559 LoC): the
method's signature idea is that heatmaps, regression targets and decoding
all live on the ACTIVE voxel slots of the sparse backbone output — no dense
BEV canvas anywhere. Here:

- the backbone's 3D out-actives are height-compressed on the host into a
  fixed-capacity BEV slot table (`ops/sparse_maps.build_bev_maps`); features
  are scatter-added into slots on device (z folds by addition, matching the
  reference sparse height compression);
- SeparateHead branches are submanifold 2D convs over the slot table
  (gather-matmul with the 3x3 `sp_bev_submap`, reusing the sparse backbone's
  conv layer) + a biased 1x1 out (hm bias -2.19, `voxelnext_head.py:32`);
- target assignment mirrors `assign_target_of_single_head:180-243`:
  per-gt nearest ACTIVE slot (argmin of squared cell distance), Gaussians
  drawn over slots via `draw_gaussian_to_heatmap_voxels` (sigma =
  (2r+1)/6), both 'gt_center' and 'nearst' types;
- losses are the sparse focal / gather-at-inds reg
  (`loss_utils.FocalLossSparse/RegLossSparse`) with padded slots masked out;
- decode mirrors `_get_predicted_boxes:293-307` + top-K over slot scores
  (`decode_bbox_from_voxels_nuscenes`); NMS runs in detector post-processing.
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import losses
from ...ops.centernet import gaussian_radius
from ...ops.selection import two_stage_topk
from ...utils.config import as_cfg
from ..backbones_3d.sparse_backbone import SparseConvBNReLU


class SeparateHeadSparse(nn.Module):
    """`SeparateHead` over slot tables (`voxelnext_head.py:13-47`)."""
    head_dict: Any
    init_bias: float = -2.19

    gather_bwd: bool = True

    @nn.compact
    def __call__(self, x, submap, mask, training: bool = False) -> dict:
        out = {}
        gb = training and self.gather_bwd
        for name, spec in self.head_dict.items():
            h = x
            for k in range(int(spec['num_conv']) - 1):
                # BEV submanifold maps are self-transpose under tap flip:
                # reuse them as the gather-transpose backward plan
                h = SparseConvBNReLU(x.shape[-1],
                                     name=f'{name}_conv{k}')(
                    h, submap, mask, training,
                    bwd_nbr=submap if gb else None)
            bias = self.init_bias if name == 'hm' else 0.0
            h = nn.Dense(int(spec['out_channels']),
                         bias_init=nn.initializers.constant(bias),
                         name=f'{name}_out')(h)
            out[name] = jnp.where(mask[..., None], h, 0.0)
        return out


class VoxelNeXtHead(nn.Module):
    model_cfg: Any
    input_channels: int
    num_class: int
    point_cloud_range: Any
    voxel_size: Any              # (vx, vy)
    class_names: Any = None

    def _groups(self):
        cfg = as_cfg(self.model_cfg)
        names = list(self.class_names) if self.class_names else \
            [str(i) for i in range(1, self.num_class + 1)]
        if cfg.get('CLASS_NAMES_EACH_HEAD'):
            return [[names.index(n) + 1 for n in head if n in names]
                    for head in cfg.CLASS_NAMES_EACH_HEAD]
        return [list(range(1, self.num_class + 1))]

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        x, coords_out, mask_out = batch['encoded_sparse_out']
        bev_mask = batch['sp_bev_mask']
        submap = batch['sp_bev_submap']
        from_out = batch['sp_bev_from_out']
        B, Vo, C = x.shape
        capb = bev_mask.shape[1]

        # sparse height compression: scatter-add out-actives into BEV slots
        idx = jnp.where(mask_out, from_out, capb)

        def scat(f, i):
            t = jnp.zeros((capb + 1, C), f.dtype)
            return t.at[i].add(f)[:capb]

        xb = jax.vmap(scat)(jnp.where(mask_out[..., None], x, 0.0), idx)
        gb = training and cfg.get('GATHER_BWD', True)
        xb = SparseConvBNReLU(cfg.get('SHARED_CONV_CHANNEL', C),
                              name='shared_conv')(
            xb, submap, bev_mask, training,
            bwd_nbr=submap if gb else None)

        head_order = list(cfg.SEPARATE_HEAD_CFG.HEAD_ORDER)
        head_dict = dict(cfg.SEPARATE_HEAD_CFG.HEAD_DICT)
        preds = []
        for gi, group in enumerate(self._groups()):
            hd = dict(head_dict)
            hd['hm'] = {'out_channels': len(group),
                        'num_conv': cfg.get('NUM_HM_CONV', 2)}
            preds.append(SeparateHeadSparse(
                head_dict=hd, gather_bwd=cfg.get('GATHER_BWD', True),
                name=f'head_{gi}')(xb, submap, bev_mask, training))
        batch['voxelnext_preds'] = preds
        batch['voxelnext_head_order'] = head_order
        return batch

    # ---- training ----

    def assign_targets(self, gt_boxes, gt_mask, bev_coords, bev_mask):
        """`assign_target_of_single_head` (`voxelnext_head.py:180-243`),
        vectorized over gts and slots."""
        cfg = as_cfg(self.model_cfg)
        acfg = cfg.TARGET_ASSIGNER_CONFIG
        stride = acfg.FEATURE_MAP_STRIDE
        n_max = acfg.get('NUM_MAX_OBJS', 500)
        ratio = cfg.get('GAUSSIAN_RATIO', 1.0)
        gtypes = cfg.get('GAUSSIAN_TYPE', ['nearst', 'gt_center'])
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        pcr = self.point_cloud_range
        out = []
        for group in self._groups():
            gids = jnp.asarray(group, jnp.int32)
            cls_g = gt_boxes[..., -1].astype(jnp.int32)
            in_group = jnp.any(cls_g[..., None] == gids[None, None], -1)
            local = jnp.argmax(cls_g[..., None] == gids[None, None], -1)
            m = gt_mask & in_group

            def single(g, mm, loc, coords, smask, n_cls=len(group)):
                M = g.shape[0]
                sy = coords[:, 0].astype(jnp.float32)
                sx = coords[:, 1].astype(jnp.float32)
                cx = (g[:, 0] - pcr[0]) / vx / stride
                cy = (g[:, 1] - pcr[1]) / vy / stride
                dxf = g[:, 3] / vx / stride
                dyf = g[:, 4] / vy / stride
                ok = mm & (dxf > 0) & (dyf > 0)
                dist = (sx[None] - cx[:, None]) ** 2 \
                    + (sy[None] - cy[:, None]) ** 2          # (M, capb)
                dist = jnp.where(smask[None], dist, 1e18)
                inds = jnp.argmin(dist, axis=1)              # (M,)
                radius = jnp.maximum(
                    gaussian_radius(dxf, dyf,
                                    acfg.get('GAUSSIAN_OVERLAP', 0.1))
                    .astype(jnp.int32),
                    acfg.get('MIN_RADIUS', 2)).astype(jnp.float32)
                sigma = (2 * radius * ratio + 1) / 6.0
                denom = 2 * sigma * sigma
                contrib = jnp.zeros_like(dist)
                if 'gt_center' in gtypes:
                    contrib = jnp.maximum(
                        contrib, jnp.exp(-dist / denom[:, None]))
                if 'nearst' in gtypes:
                    ny = sy[inds]
                    nx = sx[inds]
                    dist_n = (sx[None] - nx[:, None]) ** 2 \
                        + (sy[None] - ny[:, None]) ** 2
                    dist_n = jnp.where(smask[None], dist_n, 1e18)
                    contrib = jnp.maximum(
                        contrib, jnp.exp(-dist_n / denom[:, None]))
                contrib = jnp.where(ok[:, None], contrib, 0.0)
                onehot = jax.nn.one_hot(loc, n_cls, axis=0)  # (n_cls, M)
                heat = jnp.max(contrib[None] * onehot[..., None], axis=1)
                code = 8 + max(g.shape[1] - 8, 0)
                ret = jnp.zeros((M, code), jnp.float32)
                ret = ret.at[:, 0].set(cx - sx[inds])
                ret = ret.at[:, 1].set(cy - sy[inds])
                ret = ret.at[:, 2].set(g[:, 2])
                ret = ret.at[:, 3:6].set(
                    jnp.log(jnp.clip(g[:, 3:6], 1e-6)))
                ret = ret.at[:, 6].set(jnp.cos(g[:, 6]))
                ret = ret.at[:, 7].set(jnp.sin(g[:, 6]))
                if g.shape[1] > 8:
                    ret = ret.at[:, 8:].set(g[:, 7:-1])
                ret = jnp.where(ok[:, None], ret, 0.0)
                return (heat, ret, inds.astype(jnp.int32),
                        ok.astype(jnp.int32), g[:, :7])

            M = gt_boxes.shape[1]
            gts = gt_boxes[:, :min(M, n_max)]
            heat, ret, inds, masks, src = jax.vmap(single)(
                gts, m[:, :gts.shape[1]], local[:, :gts.shape[1]],
                bev_coords, bev_mask)
            out.append({'heatmaps': heat, 'target_boxes': ret, 'inds': inds,
                        'masks': masks, 'target_boxes_src': src})
        return out

    def get_loss(self, batch: dict, targets) -> tuple:
        cfg = as_cfg(self.model_cfg)
        lw = cfg.LOSS_CONFIG.LOSS_WEIGHTS
        order = list(cfg.SEPARATE_HEAD_CFG.HEAD_ORDER)
        bev_mask = batch['sp_bev_mask']
        total = jnp.asarray(0.0, jnp.float32)
        tb = {}
        for idx, (preds, tgt) in enumerate(zip(batch['voxelnext_preds'],
                                               targets)):
            hm = jnp.clip(jax.nn.sigmoid(preds['hm']), 1e-4, 1 - 1e-4)
            hm = jnp.swapaxes(hm, 1, 2)                   # (B, nc, capb)
            gt_hm = tgt['heatmaps']
            # sparse focal (`neg_loss_sparse`) with padded slots masked
            vm = bev_mask[:, None, :]
            pos = (gt_hm >= 1.0) & vm
            neg_w = jnp.power(1 - gt_hm, 4)
            pos_loss = jnp.log(hm) * jnp.power(1 - hm, 2) * pos
            neg_loss = jnp.log(1 - hm) * jnp.power(hm, 2) * neg_w \
                * (~pos) * vm
            num_pos = jnp.sum(pos)
            hm_loss = jnp.where(
                num_pos > 0,
                -(jnp.sum(pos_loss) + jnp.sum(neg_loss)) /
                jnp.maximum(num_pos, 1),
                -jnp.sum(neg_loss)) * lw['cls_weight']
            pred_boxes = jnp.concatenate([preds[k] for k in order], -1)
            gathered = losses.gather_feat(pred_boxes, tgt['inds'])
            reg = losses.centernet_reg_loss(gathered, tgt['masks'],
                                            tgt['target_boxes'])
            loc_loss = jnp.sum(
                reg * jnp.asarray(lw['code_weights'])) * lw['loc_weight']
            total = total + hm_loss + loc_loss
            sfx = f'_head_{idx}' if len(targets) > 1 else ''
            tb[f'hm_loss{sfx}'] = hm_loss
            tb[f'loc_loss{sfx}'] = loc_loss
        return total, tb

    # ---- inference ----

    def generate_predicted_boxes(self, batch: dict) -> dict:
        cfg = as_cfg(self.model_cfg)
        pp = cfg.POST_PROCESSING
        stride = cfg.TARGET_ASSIGNER_CONFIG.FEATURE_MAP_STRIDE
        vx, vy = float(self.voxel_size[0]), float(self.voxel_size[1])
        pcr = np.asarray(self.point_cloud_range, np.float32)
        bev_coords = batch['sp_bev_coords']
        bev_mask = batch['sp_bev_mask']
        K = pp.MAX_OBJ_PER_SAMPLE
        outs = {'pred_boxes': [], 'pred_scores': [], 'pred_labels': [],
                'pred_mask': []}
        for preds, group in zip(batch['voxelnext_preds'], self._groups()):
            B, capb, nc = preds['hm'].shape
            scores = jax.nn.sigmoid(preds['hm'])
            scores = jnp.where(bev_mask[..., None], scores, 0.0)
            flat = jnp.swapaxes(scores, 1, 2).reshape(B, nc * capb)
            top_s, top_i = two_stage_topk(flat, K)
            cls_local = top_i // capb
            slot = top_i % capb
            mapping = jnp.asarray(np.asarray(group, np.int32) - 1)
            labels = mapping[cls_local]

            def at(t):
                return jnp.take_along_axis(t, slot[..., None], axis=1)

            center = at(preds['center'])
            center_z = at(preds['center_z'])
            dim = jnp.exp(jnp.clip(at(preds['dim']), -5.0, 5.0))
            rot = at(preds['rot'])
            sy = jnp.take_along_axis(bev_coords[..., 0], slot, 1)
            sx = jnp.take_along_axis(bev_coords[..., 1], slot, 1)
            xs = (sx + center[..., 0]) * stride * vx + pcr[0]
            ys = (sy + center[..., 1]) * stride * vy + pcr[1]
            ang = jnp.arctan2(rot[..., 1], rot[..., 0])
            boxes = jnp.concatenate(
                [xs[..., None], ys[..., None], center_z, dim,
                 ang[..., None]], -1)
            valid = top_s > pp.get('SCORE_THRESH', 0.1)
            pcl = pp.get('POST_CENTER_LIMIT_RANGE', None)
            if pcl is not None:
                pcl = np.asarray(pcl, np.float32)
                valid &= jnp.all(boxes[..., :3] >= pcl[:3], -1) \
                    & jnp.all(boxes[..., :3] <= pcl[3:6], -1)
            outs['pred_boxes'].append(boxes)
            outs['pred_scores'].append(top_s)
            outs['pred_labels'].append(labels)
            outs['pred_mask'].append(valid)
        return {k: jnp.concatenate(v, axis=1) for k, v in outs.items()}
