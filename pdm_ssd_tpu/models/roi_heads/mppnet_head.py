"""MPPNet head: multi-frame proposal refinement with grouped transformers.

Re-design of `MPPNetHead` (`pcdet/models/roi_heads/mppnet_head.py:298-860`)
at reference depth — all six components of the method:

1. trajectory generation (`generate_trajectory:635-660`): current proposals
   propagated backward through their velocities, IoU-matched (>= 0.5)
   against each previous frame's proposal set; unmatched frames keep the
   current box and are flagged invalid;
2. per-frame point cropping (`crop_current/previous_frame_points:470-550`):
   fixed `num_lidar_points` samples inside each trajectory box;
3. proposal-aware GEOMETRY features (`get_proposal_aware_geometry_feature:
   551-575`): offsets to the 9 box anchors (8 corners + center) in
   spherical form (diag-normalized distance, azimuth, inclination; 27-d) +
   point features -> MLP -> SA-pooled onto `num_proxy_points` dense in-box
   grid points (`roi_grid_pool:403-443`, multi-radius masked aggregation);
4. proposal-aware MOTION features (`get_proposal_aware_motion_feature:
   577-606`): proxy offsets to the FRAME-0 box anchors + per-frame time
   codes -> MLP; summed with geometry (the reference's src fusion);
5. trajectory auxiliary branch (`trajectories_auxiliary_branch:608-633`):
   canonicalized box sequence + timestamps through a PointNet over time ->
   box_feat + an auxiliary box regression;
6. grouped transformer: frames partitioned into `num_groups`; per-group
   encoder layers over (frames/G x num_proxy) tokens; masked-max group
   tokens; a learnable decoder query cross-attends the groups; cls from the
   decoder token (`class_embed`), reg from `jointembed` over
   (group tokens, box_feat) — `mppnet_head.py:316-317,335-340`.

Recasts for TPU: ragged point crops are fixed-K masked sets; ball-query
caps become masked-radius aggregation (max over ALL in-radius neighbors —
the nsample cap only subsamples); the E2E memory bank
(`mppnet_memory_bank_e2e.py`) is functional state threaded through the
predict step instead of an in-place module attribute.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...ops import box_ops, iou3d
from ...utils.config import as_cfg
from ..layers import FCStack, SharedMLP
from .roi_head_template import RoIHeadTemplate
from .pointrcnn_head import pool_roi_points


class EncoderLayer(nn.Module):
    d_model: int
    nhead: int = 4

    @nn.compact
    def __call__(self, x, mask):
        """x: (S, L, C); mask: (S, L) valid."""
        h = nn.LayerNorm(name='ln1')(x)
        h = nn.MultiHeadDotProductAttention(
            num_heads=self.nhead, qkv_features=self.d_model,
            name='attn')(h, h, mask=mask[:, None, None, :])
        x = x + h
        h = nn.LayerNorm(name='ln2')(x)
        h = nn.Dense(2 * self.d_model, name='ff1')(h)
        h = nn.relu(h)
        return x + nn.Dense(self.d_model, name='ff2')(h)


class MLP3(nn.Module):
    """Reference `MLP(input, hidden, out, num_layers=3)` analog."""
    hidden: int
    out: int
    layers: int = 3

    @nn.compact
    def __call__(self, x):
        for i in range(self.layers - 1):
            x = nn.relu(nn.Dense(self.hidden, name=f'l{i}')(x))
        return nn.Dense(self.out, name='out')(x)


def dense_grid_points(rois, grid_size):
    """(..., 7) rois -> (..., G^3, 3) global proxy points
    (`get_dense_grid_points:381-390` + rotate + center)."""
    g = grid_size
    idx = np.stack(np.meshgrid(np.arange(g), np.arange(g), np.arange(g),
                               indexing='ij'), -1).reshape(-1, 3)
    idx = jnp.asarray(idx, jnp.float32)
    lead = rois.shape[:-1]
    flat = rois.reshape(-1, rois.shape[-1])
    local = (idx[None] + 0.5) / g * flat[:, None, 3:6] \
        - flat[:, None, 3:6] / 2
    local = box_ops.rotate_points_along_z(local, flat[:, 6])
    pts = local + flat[:, None, :3]
    return pts.reshape(lead + (g ** 3, 3))


def spherical_offsets(xyz, anchors, diag):
    """xyz (..., P, 3) points, anchors (..., 9, 3), diag (...,) box diagonal
    -> (..., P, 27) (`spherical_coordinate:454-468`)."""
    off = xyz[..., :, None, :] - anchors[..., None, :, :]    # (..., P, 9, 3)
    dis = jnp.linalg.norm(off, axis=-1)
    phi = jnp.arctan(off[..., 1] / (off[..., 0] + 1e-5))
    the = jnp.arccos(jnp.clip(off[..., 2] / (dis + 1e-5), -1, 1))
    dis = dis / (diag[..., None, None] + 1e-5)
    return jnp.concatenate([dis, phi, the], axis=-1)


def box_anchors(rois):
    """(..., 7) -> (..., 9, 3): 8 corners + center
    (`get_corner_points_of_roi:367-379`)."""
    corners = box_ops.boxes_to_corners_3d(
        rois.reshape(-1, rois.shape[-1])[:, :7])             # (N, 8, 3)
    centers = rois.reshape(-1, rois.shape[-1])[:, None, :3]
    return jnp.concatenate([corners, centers], axis=1).reshape(
        rois.shape[:-1] + (9, 3))


def init_mppnet_memory(head_cfg, batch_size: int, num_rois: int) -> dict:
    """Empty memory bank for step 0 of a streamed sequence: T-1 past frames
    of (proposal boxes+vel, validity, cached proxy-geometry features).
    All-invalid slots match nothing, so step 0 falls back to current-frame
    features exactly like the reference's sample_idx==0 branch
    (`mppnet_memory_bank_e2e.py:464-466`). Module-level (pure config ->
    shapes): callable outside init/apply."""
    hp = MPPNetHead._hp_from_cfg(head_cfg)
    P, T, d = hp['grid'] ** 3, hp['T'], hp['d']
    return {
        'rois': jnp.zeros((batch_size, T - 1, num_rois, 9), jnp.float32),
        'valid': jnp.zeros((batch_size, T - 1, num_rois), bool),
        'feat': jnp.zeros((batch_size, T - 1, num_rois, P, d), jnp.float32),
    }


class MPPNetHead(RoIHeadTemplate):
    """Reference config schema (`mppnet.yaml`): TRANS_INPUT,
    Transformer {num_lidar_points, num_proxy_points, num_groups, enc_layers,
    nheads, hidden_dim}, ROI_GRID_POOL {GRID_SIZE, POOL_RADIUS, NSAMPLE,
    MLPS}, USE_TIMESTAMP; legacy flat keys (NUM_FRAMES, NUM_GROUPS,
    SAMPLE_POINTS_PER_FRAME, HIDDEN_CHANNEL) remain accepted."""
    input_channels: int = 0

    def _hp(self):
        return self._hp_from_cfg(self.model_cfg)

    def proposal_layer(self, batch: dict, training: bool) -> dict:
        """Offline-proposal mode (USE_PREDBOX): when the dataset ships
        per-frame stage-1 boxes as `roi_boxes` (B, T, R, 9) + scores/labels,
        frame 0 becomes the current rois (velocity kept aside as `roi_vel`)
        and the full stack feeds trajectory matching — stage-1 NMS is
        skipped entirely (reference `mppnet_head.py` consumes
        `batch_dict['roi_boxes']` the same way). Otherwise falls back to the
        standard NMS proposal layer."""
        rb = batch.get('roi_boxes')
        if rb is not None and getattr(rb, 'ndim', 0) == 4:
            batch['rois'] = rb[:, 0, :, :7]
            batch['roi_vel'] = rb[:, 0, :, 7:9]
            batch['roi_scores'] = batch['roi_scores'][:, 0]
            batch['roi_labels'] = batch['roi_labels'][:, 0].astype(jnp.int32)
            batch['roi_mask'] = (rb[:, 0, :, 3:6] > 0).all(-1)
            batch['proposals_multi_frame'] = rb
            return batch
        return super().proposal_layer(batch, training)

    @staticmethod
    def _hp_from_cfg(model_cfg):
        cfg = as_cfg(model_cfg)
        tr = cfg.get('Transformer', {})
        gp = cfg.get('ROI_GRID_POOL', {})
        get = (lambda d, k, dflt: d.get(k, dflt) if hasattr(d, 'get') else dflt)
        return {
            'T': int(cfg.get('NUM_FRAMES', 4)),
            'G': int(get(tr, 'num_groups', cfg.get('NUM_GROUPS', 2))),
            'K': int(get(tr, 'num_lidar_points',
                         cfg.get('SAMPLE_POINTS_PER_FRAME', 32))),
            'd': int(cfg.get('TRANS_INPUT', cfg.get('HIDDEN_CHANNEL', 64))),
            'enc_layers': int(get(tr, 'enc_layers', 1)),
            'nhead': int(get(tr, 'nheads', cfg.get('NUM_HEADS', 4))),
            'grid': int(get(gp, 'GRID_SIZE', 4)),
            'radii': [float(r) for r in get(gp, 'POOL_RADIUS', [0.8, 1.6])],
            'mlp': [int(c) for c in (get(gp, 'MLPS', [[32, 32]]) or
                                     [[32, 32]])[0]],
        }

    def generate_trajectory(self, rois, roi_mask, proposals_mf,
                            with_match=False):
        """`generate_trajectory:635-660`. rois: (B, R, 7+) current (col 7:9 =
        vx, vy when present); proposals_mf: (B, T, P, 9) per-frame proposal
        sets. Returns trajectory (B, T, R, 7), valid (B, T, R); with
        `with_match` also the per-frame matched proposal index (B, T, R)
        (frame 0 = identity) — the E2E memory bank's matching table
        (`mppnet_memory_bank_e2e.py:331-358` matching_table)."""
        hp = self._hp()
        T = hp['T']
        B, R = rois.shape[:2]
        cur = rois[..., :7]
        vel = rois[..., 7:9] if rois.shape[-1] > 8 else jnp.zeros(
            (B, R, 2), rois.dtype)
        traj = [cur]
        valid = [jnp.ones((B, R), bool) if roi_mask is None else roi_mask]
        match = [jnp.broadcast_to(jnp.arange(R, dtype=jnp.int32)[None],
                                  (B, R))]
        prev = jnp.concatenate([cur, vel], -1)
        for t in range(1, T):
            shifted = prev[..., :7].at[..., 0:2].add(-prev[..., 7:9] * 0.1) \
                if proposals_mf is not None else prev[..., :7]
            if proposals_mf is None:
                traj.append(cur)
                valid.append(valid[0])
                match.append(match[0])
                continue
            props = proposals_mf[:, t]                       # (B, P, 9)
            ious = jax.vmap(iou3d.boxes_iou3d)(shifted, props[..., :7])
            best = jnp.argmax(ious, axis=-1)                 # (B, R)
            best_iou = jnp.max(ious, axis=-1)
            fg = best_iou >= 0.5
            matched = jnp.take_along_axis(
                props, best[..., None], axis=1)              # (B, R, 9)
            traj.append(jnp.where(fg[..., None], matched[..., :7], cur))
            valid.append(fg & valid[0])
            match.append(best.astype(jnp.int32))
            prev = jnp.where(fg[..., None], matched,
                             jnp.concatenate([shifted, prev[..., 7:9]], -1))
        out = (jnp.stack(traj, axis=1), jnp.stack(valid, axis=1))
        if with_match:
            return out + (jnp.stack(match, axis=1),)
        return out

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        cfg = as_cfg(self.model_cfg)
        hp = self._hp()
        T, G, K, d = hp['T'], hp['G'], hp['K'], hp['d']
        n_proxy = hp['grid'] ** 3

        batch = self.proposal_layer(batch, training=training)
        if training and 'gt_boxes' in batch:
            batch['roi_targets'] = self.assign_targets(batch)
        rois = batch['rois']                              # (B, R, 7)
        B, R = rois.shape[:2]

        # E2E memory bank (functional recast of `mppnet_memory_bank_e2e.py`):
        # past frames' proposal boxes + cached proxy-geometry features are
        # threaded through the predict loop as a fixed-shape state dict
        # instead of a module attribute; only the CURRENT frame's points are
        # cropped and featurized each step.
        mem = batch.get('mppnet_memory')
        midx = None
        use_mem = mem is not None and 'trajectory_rois' not in batch
        if 'trajectory_rois' in batch:
            traj = batch['trajectory_rois']
            tvalid = batch.get(
                'trajectory_valid', jnp.ones(traj.shape[:3], bool))
            frames = batch['points_multi_frame']
        elif mem is not None:
            # memory rois double as the per-frame proposal sets; frame 0 of
            # the proposals tensor is never read (identity match)
            props = jnp.concatenate(
                [mem['rois'][:, :1], mem['rois']], axis=1)    # (B, T, P, 9)
            traj, tvalid, midx = self.generate_trajectory(
                rois, batch.get('roi_mask'), props, with_match=True)
            frames = batch.get('points_multi_frame')
            if frames is None:
                frames = batch['points'][:, None]             # (B, 1, N, 3+F)
        else:
            frames = batch['points_multi_frame']              # (B, T, N, 3+F)
            assert frames.shape[1] >= T
            rois_tv = rois if 'roi_vel' not in batch else jnp.concatenate(
                [rois[..., :7], batch['roi_vel']], axis=-1)
            traj, tvalid = self.generate_trajectory(
                rois_tv, batch.get('roi_mask'),
                batch.get('proposals_multi_frame'))
        batch['trajectory_rois'], batch['trajectory_valid'] = traj, tvalid

        diag = jnp.linalg.norm(traj[..., 3:6], axis=-1)   # (B, T, R)
        anchors0 = box_anchors(traj[:, 0])                # (B, R, 9, 3)

        # ---- per-frame crop + geometry features + SA pool to proxies ----
        geo_mlp = MLP3(64, d // max(len(hp['radii']), 1), name='up_geometry')
        agg_mlp = SharedMLP(tuple(hp['mlp']), name='sa_mlp')

        def frame_geometry(t):
            """Crop frame t's points inside the trajectory boxes and pool
            geometry features onto the box proxy grid -> (B, R, P, C)."""
            t_rois = traj[:, t]
            pts_t = frames[:, t, :, :3]
            idx, pvalid = pool_roi_points(
                pts_t, t_rois[..., :7], K, extra=0.5,
                roi_mask=batch.get('roi_mask'))
            pvalid = pvalid & tvalid[:, t, :, None]

            def gather(x, i):
                return jnp.take_along_axis(
                    x, i.reshape(i.shape[0], -1)[..., None], axis=1
                ).reshape(i.shape + (x.shape[-1],))

            pooled = gather(frames[:, t], idx)            # (B, R, K, 3+F)
            anchors_t = box_anchors(t_rois)
            sph = spherical_offsets(pooled[..., :3], anchors_t,
                                    diag[:, t])           # (B, R, K, 27)
            tcol = jnp.full((B, R, K, 1), t * 0.1, jnp.float32)
            feat_in = jnp.concatenate(
                [sph, pooled[..., 3:4], tcol], -1)        # 29-d
            pf = geo_mlp(jnp.where(pvalid[..., None], feat_in, 0.0))

            # proxy points of this frame's boxes; masked multi-radius agg
            proxies = dense_grid_points(t_rois, hp['grid'])  # (B,R,P,3)
            d2 = jnp.sum((proxies[:, :, :, None] -
                          pooled[..., None, :, :3]) ** 2, -1)  # (B,R,P,K)
            per_r = []
            for r in hp['radii']:
                w = (d2 < r * r) & pvalid[:, :, None, :]
                rel = pooled[..., None, :, :3] - proxies[..., None, :]
                g_in = jnp.concatenate(
                    [jnp.broadcast_to(rel, d2.shape + (3,)),
                     jnp.broadcast_to(pf[:, :, None], d2.shape +
                                      (pf.shape[-1],))], -1)
                h = agg_mlp(g_in, training=training)
                h = jnp.where(w[..., None], h, -jnp.inf)
                pooled_r = jnp.max(h, axis=3)
                any_w = jnp.any(w, axis=3)
                per_r.append(jnp.where(any_w[..., None], pooled_r, 0.0))
            return jnp.concatenate(per_r, -1)             # (B, R, P, C)

        geo_proj = nn.Dense(d, name='geo_proj')
        if use_mem:
            # current frame featurized; past frames read from the bank.
            # Unmatched past frames fall back to the current frame's features
            # (the reference's src_repeat default, `mppnet_memory_bank_e2e
            # .py:452-462`), so their tokens stay valid.
            proj0 = geo_proj(frame_geometry(0))           # (B, R, P, d)
            frames_feats = [proj0]
            for t in range(1, T):
                cached = jnp.take_along_axis(
                    mem['feat'][:, t - 1],
                    midx[:, t][..., None, None], axis=1)  # (B, R, P, d)
                fg = tvalid[:, t][..., None, None]
                frames_feats.append(jnp.where(fg, cached, proj0))
            proxy_geo = jnp.stack(frames_feats, axis=2)   # (B, R, T, P, d)
            proxy_msk = jnp.broadcast_to(
                tvalid[:, 0][:, :, None, None], (B, R, T, n_proxy))
            # rolling update: shift the bank by one frame
            vel = rois[..., 7:9] if rois.shape[-1] > 8 else jnp.zeros(
                (B, R, 2), rois.dtype)
            cur9 = jnp.concatenate([rois[..., :7], vel], -1)
            valid0 = tvalid[:, 0]
            cur9 = jnp.where(valid0[..., None], cur9, 0.0)
            batch['mppnet_memory'] = {
                'rois': jnp.concatenate(
                    [cur9[:, None], mem['rois'][:, :-1]], axis=1),
                'valid': jnp.concatenate(
                    [valid0[:, None], mem['valid'][:, :-1]], axis=1),
                'feat': jnp.concatenate(
                    [proj0[:, None], mem['feat'][:, :-1]], axis=1),
            }
        else:
            proxy_all = [frame_geometry(t) for t in range(T)]
            proxy_msk = jnp.broadcast_to(
                jnp.swapaxes(tvalid, 1, 2)[..., None], (B, R, T, n_proxy))
            proxy_geo = geo_proj(jnp.stack(proxy_all, axis=2))

        # ---- motion features: proxies relative to the frame-0 box ----
        proxies_seq = jnp.stack(
            [dense_grid_points(traj[:, t], hp['grid']) for t in range(T)],
            axis=2)                                       # (B, R, T, P, 3)
        sph0 = spherical_offsets(
            proxies_seq.reshape(B, R, T * n_proxy, 3), anchors0,
            diag[:, 0]).reshape(B, R, T, n_proxy, 27)
        tcodes = jnp.tile(
            jnp.arange(T, dtype=jnp.float32)[None, None, :, None, None]
            * 0.1, (B, R, 1, n_proxy, 1))
        pad2 = jnp.zeros((B, R, T, n_proxy, 2), jnp.float32)
        motion = MLP3(64, d, name='up_motion')(
            jnp.concatenate([sph0, pad2, tcodes], -1))    # 30-d input
        src = proxy_geo + motion                          # reference fusion

        # ---- trajectory auxiliary branch (PointNet over time) ----
        ts = jnp.arange(T, dtype=jnp.float32)[None, :, None, None] * 0.1
        box_seq = jnp.concatenate(
            [traj[..., :7], jnp.tile(ts, (B, 1, R, 1))], -1)
        box_seq = box_seq.at[..., 0:3].add(-box_seq[:, 0:1, :, 0:3])
        ry0 = traj[:, 0, :, 6] % (2 * np.pi)              # (B, R)
        flat_seq = jnp.swapaxes(box_seq, 1, 2).reshape(B * R, T, 8)
        rot_xyz = box_ops.rotate_points_along_z(
            flat_seq[..., :3], -ry0.reshape(B * R))
        flat_seq = jnp.concatenate(
            [rot_xyz, flat_seq[..., 3:6],
             jnp.zeros((B * R, T, 1)), flat_seq[..., 7:]], -1)
        h_seq = flat_seq
        for i, ch in enumerate((64, 128, d)):
            h_seq = nn.relu(nn.Dense(ch, name=f'seqbox_{i}')(h_seq))
        box_feat = jnp.max(h_seq, axis=1)                 # (B*R, d)
        box_reg_aux = nn.Dense(self.code_size, name='seqbox_reg')(box_feat)

        # ---- grouped transformer ----
        fpg = T // G
        tok = src.reshape(B * R * G, fpg * n_proxy, d)
        msk = proxy_msk.reshape(B * R * G, fpg * n_proxy)
        emb = nn.Dense(d, name='point_embed')(tok)
        for li in range(hp['enc_layers']):
            emb = EncoderLayer(d, hp['nhead'], name=f'enc_{li}')(emb, msk)
        emb = jnp.where(msk[..., None], emb, -jnp.inf)
        gtok = jnp.max(emb, axis=1)
        gtok = jnp.where(jnp.isfinite(gtok), gtok, 0.0)
        gtok = gtok.reshape(B * R, G, d)

        query = self.param('traj_query', nn.initializers.normal(0.02),
                           (1, 1, d))
        q = jnp.broadcast_to(query, (B * R, 1, d))
        q = nn.MultiHeadDotProductAttention(
            num_heads=hp['nhead'], qkv_features=d,
            name='cross_group')(q, gtok)[:, 0]            # (B*R, d)

        # heads: class_embed on the decoder token; jointembed over
        # (group tokens, box_feat) for the final box (`mppnet_head.py:
        # 316-317,335-340`)
        rcnn_cls = nn.Dense(1, name='class_embed')(
            SharedMLP((d,), name='cls_trunk')(q, training=training))
        joint_in = jnp.concatenate([gtok.reshape(B * R, G * d), box_feat], -1)
        rcnn_reg = MLP3(d, self.code_size, layers=4,
                        name='jointembed')(joint_in)
        batch['rcnn_cls_preds'] = rcnn_cls.reshape(B, R, 1)
        batch['rcnn_reg_preds'] = rcnn_reg.reshape(B, R, self.code_size)
        batch['rcnn_reg_aux_preds'] = box_reg_aux.reshape(B, R, self.code_size)
        return batch

    def init_memory(self, batch_size: int, num_rois: int) -> dict:
        return init_mppnet_memory(self.model_cfg, batch_size, num_rois)

    @property
    def code_size(self):
        return 7

    def get_loss(self, batch: dict, targets: dict):
        """Template losses + the auxiliary trajectory-branch regression
        (reference `get_box_reg_layer_loss:814-917` adds the seqbox reg
        against the same targets)."""
        loss, tb = super().get_loss(batch, targets)
        t = targets
        if t is not None and 'rcnn_reg_aux_preds' in batch:
            from ...ops import losses as L
            reg_valid = t['reg_valid_mask'].astype(jnp.float32)
            aux = L.weighted_smooth_l1(
                batch['rcnn_reg_aux_preds'], t['rcnn_reg_targets'])
            aux = jnp.sum(jnp.mean(aux, -1) * reg_valid) \
                / jnp.maximum(jnp.sum(reg_valid), 1.0)
            loss = loss + aux
            tb['rcnn_reg_aux_loss'] = aux
        return loss, tb
