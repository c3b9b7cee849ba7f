"""Focal sparse conv backbone, TPU-native (`VoxelBackBone8xFocal`).

Re-design of the reference's focal sparse convolution (Focals Conv,
`pcdet/models/backbones_3d/spconv_backbone_focal.py:101-269` +
`focal_sparse_conv/focal_sparse_conv.py:9-224`,
`focal_sparse_conv/focal_sparse_utils.py:89-147`): a learned importance
head (a 3^3 submanifold conv -> 27 logits per voxel) picks foreground
voxels, multiplies their features by predicted kernel masks, and *spawns*
new zero-feature voxels at kernel offsets whose mask clears a threshold —
dynamically growing the active set through the ladder.

TPU recast (static shapes): the host precomputes the MAXIMAL dilated
candidate table E_s per focal stage plus all downstream kernel maps over
it (`ops/sparse_maps.build_focal_ladder_maps`); the device flows per-slot
ACTIVATION BITS — the learned mask toggles bits, shapes never change.
Semantics map 1:1:

  reference                          | here
  -----------------------------------+----------------------------------
  split_voxels topk/threshold select | in-graph rank over active slots
  spawn at offsets with mask >= thr  | bit OR over host `fl_espawn` table
  check_repeat merge (add feats,     | spawns carry zero features; merged
    average masks)                   |   mask = sum/count over contribs
  combine_out fore+back              | bit union, bg features unscaled
  focal loss on voxel-in-gt-box      | identical (incl. the reference's
                                     |   softmax-over-probabilities form)
"""
from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.box_ops import points_in_boxes_batch
from ...ops.pointnet2 import flat_gather
from ...ops.sparse_maps import ladder_shapes
from ...utils.config import as_cfg
from .sparse_backbone import SparseConvBNReLU


def gather_pad(table: jax.Array, idx: jax.Array) -> jax.Array:
    """Row gather from a (B, V, C) table where index V reads a zero row."""
    B, V, C = table.shape
    padded = jnp.concatenate([table, jnp.zeros((B, 1, C), table.dtype)], 1)
    return flat_gather(padded, idx)


def gather_bits(bits: jax.Array, idx: jax.Array) -> jax.Array:
    """Bool gather with pad slot = False. bits (B, V), idx (B, ...)."""
    return gather_pad(bits[..., None].astype(jnp.float32), idx)[..., 0] > 0.5


def focal_split(x, act, imps, eorig, espawn, emask, *, topk=True,
                threshold=0.5, mask_multi=False, skip_mask_kernel=False):
    """The focal fore/back split + spawn dilation as pure slot-table
    algebra (the static-shape equivalent of `split_voxels` + `check_repeat`
    + `combine_out`, `focal_sparse_utils.py:89-147`,
    `focal_sparse_conv.py:115-215`).

    x (B, capC, C) features over the candidate table, act (B, capC)
    activation bits, imps (B, capC, 27) importance logits. Returns
    (feats_E (B, capE, C), bits_E (B, capE)) — the enlarged table the
    following submanifold conv consumes."""
    thr = threshold
    mv = jnp.where(act, jax.nn.sigmoid(imps[..., 26]), 0.0)

    if topk:
        # fg = top floor(thr * n_active) actives by mask (`split_voxels:
        # 112-115`)
        n_act = jnp.sum(act, axis=1)
        k = jnp.floor(thr * n_act).astype(jnp.int32)
        score = jnp.where(act, mv, -1.0)
        order = jnp.argsort(-score, axis=1)
        rank = jnp.argsort(order, axis=1)
        fg = act & (rank < k[:, None])
    else:
        fg = act & (mv > thr)

    if mask_multi:                       # `split_voxels:109-110`
        x = x * mv[..., None]

    # spawn bits + merged kernel masks over E: spawn j lands on E-slot c iff
    # the source c - offset_j is an fg voxel whose offset mask clears thr;
    # duplicate contributions merge by (sum / count) exactly as check_repeat
    # averages `features_add`
    msig = jax.nn.sigmoid(imps[..., :26])
    fgf = fg.astype(jnp.float32)
    ssum = jnp.zeros(espawn.shape[:2], jnp.float32)
    scnt = jnp.zeros(espawn.shape[:2], jnp.float32)
    pair_t = jnp.concatenate([msig, fgf[..., None]], -1)       # (B,capC,27)
    for j in range(26):
        g = gather_pad(pair_t[..., (j, 26)], espawn[..., j])
        mval, src_fg = g[..., 0], g[..., 1] > 0.5
        hit = src_fg & (mval >= thr)
        ssum += jnp.where(hit, mval, 0.0)
        scnt += hit.astype(jnp.float32)

    orig_fg = gather_bits(fg, eorig)
    orig_act = gather_bits(act, eorig)
    cnt = scnt + orig_fg.astype(jnp.float32)
    merged = (ssum + orig_fg.astype(jnp.float32)) / jnp.maximum(cnt, 1.0)
    fore = cnt > 0
    back = orig_act & ~orig_fg
    bits = (fore | back) & emask

    feats = gather_pad(x, eorig)                               # (B,capE,C)
    if not skip_mask_kernel:             # `forward:213-214`
        feats = feats * jnp.where(orig_fg, merged, 1.0)[..., None]
    return jnp.where(bits[..., None], feats, 0.0), bits


class FocalSparseConv(nn.Module):
    """One focal layer: importance prediction over the candidate table C_s,
    foreground split + spawn-bit dilation onto E_s, then a submanifold conv
    over E_s. Returns (feats_E, bits_E, loss_box_of_pts).

    Matches `FocalSparseConv.forward` (`focal_sparse_conv.py:199-224`) with
    `_gen_sparse_features`/`split_voxels`/`check_repeat`/`combine_out`
    folded into the bit/merged-mask algebra described in the module doc."""
    features: int
    voxel_stride: int
    voxel_size: Any                 # (vx, vy, vz)
    point_cloud_range: Any
    topk: bool = True
    threshold: float = 0.5
    mask_multi: bool = False
    skip_mask_kernel: bool = False
    enlarge_channels: int = -1

    @nn.compact
    def __call__(self, x, act, submap, coords, ecoords, emask, eorig,
                 espawn, esubmap, gt_boxes, gt_mask, training: bool = False):
        B, capC, _ = x.shape
        thr = self.threshold

        xp = x
        if self.enlarge_channels > 0:    # conv_enlarge (:35-38)
            xp = SparseConvBNReLU(self.enlarge_channels,
                                  name='conv_enlarge')(xp, submap, act,
                                                       training)
        # conv_imp: subm k3 -> 27 logits; channels 0..25 = kernel offsets in
        # reference order, channel 26 = center-voxel mask (:40-44)
        from .sparse_backbone import gather_taps
        imps = nn.Dense(27, use_bias=False, name='conv_imp')(
            gather_taps(xp, submap))
        mv = jnp.where(act, jax.nn.sigmoid(imps[..., 26]), 0.0)   # (B, capC)

        loss = 0.0
        if training:
            # focal loss on center-in-gt-box targets (`_gen_sparse_features:
            # 134-167`; reproduces the reference FocalLoss's softmax over
            # the [1-m, m] probability pair, `focal_sparse_utils.py:29-37`)
            vsz = jnp.asarray(self.voxel_size, jnp.float32)
            org = jnp.asarray(self.point_cloud_range[:3], jnp.float32)
            xyz = (coords[..., ::-1].astype(jnp.float32) * self.voxel_stride
                   * vsz + org)
            inbox = points_in_boxes_batch(xyz, gt_boxes[..., :7], gt_mask)
            tgt = (inbox >= 0).astype(jnp.float32)
            pair = jnp.stack([1.0 - mv, mv], -1)
            p = jax.nn.softmax(pair, axis=-1)
            p = jnp.clip(p, 1e-7, 1.0 - 1e-7)
            y = jnp.stack([1.0 - tgt, tgt], -1)
            per = -y * jnp.log(p) * (1.0 - p) ** 2.0
            m = act[..., None].astype(jnp.float32)
            loss = jnp.sum(per * m) / jnp.maximum(jnp.sum(m) * 2.0, 1.0)

        feats, bits = focal_split(
            x, act, imps, eorig, espawn, emask, topk=self.topk,
            threshold=thr, mask_multi=self.mask_multi,
            skip_mask_kernel=self.skip_mask_kernel)

        out = SparseConvBNReLU(self.features, name='conv')(
            feats, esubmap, bits, training,
            bwd_nbr=esubmap if training else None)
        return out, bits, loss


class VoxelBackBone8xFocal(nn.Module):
    """Config mirror of `VoxelBackBone8xFocal.__init__`
    (`spconv_backbone_focal.py:101-201`): NUM_FILTERS ([16, 32, 64, 64]),
    OUT_FEATURES (128), TOPK, THRESHOLD, MASK_MULTI, SKIP_MASK_KERNEL,
    ENLARGE_VOXEL_CHANNELS. Focal layers close conv1/conv2/conv3; conv4 and
    conv_out are plain. Consumes the host focal ladder
    (`ops/sparse_maps.FOCAL_KEYS`); adds 'loss_box_of_pts' to the batch
    (summed into the detector loss, reference `get_loss:203-208`)."""
    model_cfg: Any
    input_channels: int
    grid_size: Any                 # (W, H, D)
    voxel_size: Any = (0.05, 0.05, 0.1)
    point_cloud_range: Any = (0, -40, -3, 70.4, 40, 1)

    @property
    def num_bev_features(self):
        cfg = as_cfg(self.model_cfg)
        return cfg.get('OUT_FEATURES', 128) * ladder_shapes(self.grid_size)[4][0]

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        filters = cfg.get('NUM_FILTERS', [16, 32, 64, 64])
        out_ch = cfg.get('OUT_FEATURES', 128)
        fkw = dict(voxel_size=self.voxel_size,
                   point_cloud_range=self.point_cloud_range,
                   topk=cfg.get('TOPK', True),
                   threshold=cfg.get('THRESHOLD', 0.5),
                   mask_multi=cfg.get('MASK_MULTI', False),
                   skip_mask_kernel=cfg.get('SKIP_MASK_KERNEL', False),
                   enlarge_channels=cfg.get('ENLARGE_VOXEL_CHANNELS', -1))
        gt_boxes = batch.get('gt_boxes')
        gt_mask = batch.get('gt_mask')
        if gt_boxes is None:             # predict path: no focal loss
            gt_boxes = jnp.zeros((batch['voxel_features'].shape[0], 1, 7))
            gt_mask = jnp.zeros(gt_boxes.shape[:2], bool)

        feats = batch['voxel_features']
        feats = jax.vmap(lambda f, p: f[p])(feats, batch['fl_perm1'])
        ms = {}
        total_loss = 0.0

        # conv_input + conv1 subm block over C_1 (static base mask)
        m1, n1 = batch['fl_cmask1'], batch['fl_submap1']
        # submanifold maps are self-transpose: reuse as the
        # gather-transpose backward plan (down maps keep XLA autodiff —
        # the focal ladder has no host-built inverses)
        gbwd = training and cfg.get('GATHER_BWD', True)
        bwd = (lambda nbr: nbr) if gbwd else (lambda nbr: None)
        x = SparseConvBNReLU(filters[0], name='conv_input')(
            jnp.where(m1[..., None], feats, 0.0), n1, m1, training,
            bwd_nbr=bwd(n1))
        x = SparseConvBNReLU(filters[0], name='conv1_subm0')(
            x, n1, m1, training, bwd_nbr=bwd(n1))
        act = m1

        n_sub = {1: 0, 2: 2, 3: 2}       # extra subm blocks before focal
        for s, ch in zip((1, 2, 3), filters[:3]):
            if s > 1:
                # strided down conv from E_{s-1} onto C_s; out bit = any
                # active input in the receptive field (spconv semantics)
                down = batch[f'fl_downmap{s}']
                bit_in = act
                nxt = jnp.any(gather_bits(bit_in, down), axis=-1) \
                    & batch[f'fl_cmask{s}']
                x = SparseConvBNReLU(ch, name=f'down{s}')(
                    x, down, nxt, training)
                act = nxt
                for i in range(n_sub[s]):
                    x = SparseConvBNReLU(ch, name=f'conv{s}_subm{i}')(
                        x, batch[f'fl_submap{s}'], act, training,
                        bwd_nbr=bwd(batch[f'fl_submap{s}']))
            x, act, floss = FocalSparseConv(
                ch, voxel_stride=2 ** (s - 1), name=f'focal{s}', **fkw)(
                x, act, batch[f'fl_submap{s}'], batch[f'fl_coords{s}'],
                batch[f'fl_ecoords{s}'], batch[f'fl_emask{s}'],
                batch[f'fl_eorig{s}'], batch[f'fl_espawn{s}'],
                batch[f'fl_esubmap{s}'], gt_boxes, gt_mask, training)
            total_loss = total_loss + floss
            ms[f'x_conv{s}'] = (x, batch[f'fl_ecoords{s}'], act, 2 ** (s - 1))

        # conv4 (no focal) + conv_out
        down4 = batch['fl_downmap4']
        a4 = jnp.any(gather_bits(act, down4), axis=-1) & batch['fl_cmask4']
        x = SparseConvBNReLU(filters[3], name='down4')(x, down4, a4, training)
        for i in range(2):
            x = SparseConvBNReLU(filters[3], name=f'conv4_subm{i}')(
                x, batch['fl_submap4'], a4, training,
                bwd_nbr=bwd(batch['fl_submap4']))
        ms['x_conv4'] = (x, batch['fl_coords4'], a4, 8)
        outmap = batch['fl_outmap']
        ao = jnp.any(gather_bits(a4, outmap), axis=-1) & batch['fl_cmask_out']
        x = SparseConvBNReLU(out_ch, name='conv_out')(x, outmap, ao, training)

        # scatter to the stride-8 BEV canvas (same as SparseVoxelBackBone8x)
        Dz, Hy, Wx = ladder_shapes(self.grid_size)[4]
        co = batch['fl_coords_out'].astype(jnp.int32)
        ncell = Dz * Hy * Wx
        flat = (co[..., 0] * Hy + co[..., 1]) * Wx + co[..., 2]
        flat = jnp.where(ao, flat, ncell)
        B = flat.shape[0]
        boff = (jnp.arange(B, dtype=flat.dtype) * (ncell + 1))[:, None]
        canvas = jnp.zeros((B * (ncell + 1), out_ch), x.dtype)
        dense = canvas.at[(flat + boff).reshape(-1)].add(
            x.reshape(-1, out_ch)).reshape(B, ncell + 1, out_ch)[:, :ncell]
        dense = dense.reshape(-1, Dz, Hy, Wx, out_ch)
        batch['multi_scale_3d_features_sparse'] = ms
        batch['encoded_sparse_out'] = (x, co, ao)
        batch['loss_box_of_pts'] = total_loss
        batch['spatial_features'] = jnp.moveaxis(dense, 1, 3).reshape(
            dense.shape[0], Hy, Wx, Dz * out_ch)
        batch['spatial_features_stride'] = 8
        return batch
