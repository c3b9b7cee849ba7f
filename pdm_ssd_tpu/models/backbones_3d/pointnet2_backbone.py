"""PointNet++ MSG backbone, TPU-native.

Re-design of the reference `PointNet2MSG` (`pcdet/models/backbones_3d/
pointnet2_backbone.py:9-94`) and its SA/FP modules (`pcdet/ops/pointnet2/
pointnet2_batch/pointnet2_modules.py:10-171`):

- batched fixed shapes (B, N, C) channels-last instead of stacked (N1+N2, C);
- FPS / ball-query / grouping from `pdm_ssd_tpu.ops` (pure-JAX now, Pallas
  kernels swap in underneath without touching this module);
- grouped shared-MLPs are Dense stacks over (B, M, K, C) — XLA maps them to
  MXU matmuls of shape (B*M*K, C_in) x (C_in, C_out);
- same config schema: SA_CONFIG.{NPOINTS, RADIUS, NSAMPLE, MLPS}, FP_MLPS.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops import dispatch, pointnet2 as p2
from ..layers import SharedMLP
from ...utils.config import as_cfg


class SAModuleMSG(nn.Module):
    """Set-abstraction with multi-scale grouping (`pointnet2_modules.py:58-99`).

    `sample_method`: 'fps' (Pallas kernel on TPU), 'random', or 'prefix' —
    'random': the pipeline shuffles points (`shuffle_points` processor), so
    taking the first `npoint` slots IS a uniform random subsample; it removes
    the sequential FPS cost at high-resolution levels (3DSSD-style trade-off).
    NOTE: 'random' is uniform only when the level's input is shuffled — i.e.
    at levels before any 'fps' level. After an 'fps' level the input is in
    farthest-first pick order, so 'random' degenerates to a deterministic FPS
    prefix (which is exactly the 'prefix' semantics, and arguably a better
    subsample; configs that want true randomness mid-stack must re-shuffle).
    'prefix': EXACT FPS for inputs already in farthest-first (FPS pick) order.
    A farthest-first traversal has the prefix property: if S is the FPS output
    of a parent cloud (in pick order, same seed-at-0 / first-argmax rules as
    `ops/pointnet2.farthest_point_sample`), then FPS(S, k) == arange(k) —
    each pick S[i] attains the max over the parent superset, hence over S, and
    any exact tie S[j] was picked later (j > i) so first-argmax still selects
    S[i]. Duplicate-padded clouds (fewer distinct points than the parent
    npoint) stay value-exact: the parent's degenerate tail picks index 0
    forever, so S[i>=D] == S[0], which is also what true FPS(S) selects once
    all distances hit zero. Used automatically by `PointNet2MSG` for SA levels
    whose input is the previous level's FPS output (reference recomputes FPS
    each level, `pointnet2_modules.py:58-99` — same indices, zero serial cost).
    `pc_range`: (xmin, ymin, xmax, ymax) enables the bucketed grid ball query
    on TPU (`ops/neighbor_grid.py`).
    """
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    sample_method: str = 'fps'
    pc_range: Sequence[float] | None = None

    @nn.compact
    def __call__(self, xyz, features, training: bool = False):
        """xyz: (B, N, 3); features: (B, N, C) or None.
        Returns new_xyz (B, npoint, 3), new_features (B, npoint, sum(mlps[-1]))."""
        if self.sample_method == 'random' and self.has_rng('sampling'):
            # true uniform subsample: fresh permutation per apply. Only taken
            # when the caller provides a 'sampling' rng; the default path
            # relies on host-side shuffle_points for uniformity (see class
            # docstring for the FPS-ordered-input caveat).
            perm = jax.random.permutation(
                self.make_rng('sampling'), xyz.shape[1])[:self.npoint]
            new_xyz = xyz[:, perm]
        elif self.sample_method in ('random', 'prefix'):
            new_xyz = xyz[:, :self.npoint]
        else:
            fps_idx = dispatch.farthest_point_sample(xyz, self.npoint)
            new_xyz = dispatch.gather_operation(xyz, fps_idx)

        outs = []
        for i, (radius, nsample, mlp) in enumerate(zip(self.radii, self.nsamples, self.mlps)):
            idx = dispatch.ball_query(radius, nsample, xyz, new_xyz,
                                      pc_range=self.pc_range)
            grouped_xyz = dispatch.grouping_operation(xyz, idx) - new_xyz[:, :, None, :]
            if features is not None:
                grouped_feats = dispatch.grouping_operation(features, idx)
                grouped = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1) \
                    if self.use_xyz else grouped_feats
            else:
                grouped = grouped_xyz
            feat = SharedMLP(mlp, name=f'mlp_{i}')(grouped, training=training)
            outs.append(jnp.max(feat, axis=2))  # max over nsample
        return new_xyz, jnp.concatenate(outs, axis=-1)


class SAGroupMLP(nn.Module):
    """Grouping + shared-MLP + max-pool around EXTERNAL centers — the fused
    aggregation core shared by `SAModuleMSGFused` (which adds sampling) and
    `VoxelSetAbstraction` (keypoints as centers; reference analog
    `pointnet2_stack_modules.build_local_aggregation_module`).

    MXU-fused via `ops/sa_fused.py`; the first shared-MLP Dense is split by
    linearity (Dense([rel_xyz; feat]) = Dense_xyz(rel) + Dense_feat(feat),
    bias-free because BN follows — reference stack
    `pointnet2_modules.py:90-97`).
    """
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    pc_range: Sequence[float] | None = None
    bucket_cap: int = 32

    @nn.compact
    def __call__(self, xyz, features, new_xyz, training: bool = False):
        from ...ops import sa_fused

        h1 = [int(m[0]) for m in self.mlps]
        # the first Dense (C -> H1) commutes with grouping (pure row selection):
        # apply it BEFORE the table only when it shrinks the gathered bytes
        # (C > H1); for raw narrow inputs the features ride inside the bucket
        # table and the Dense runs on the grouped (B, M, K, C) tensor.
        C = 0 if features is None else features.shape[-1]
        pre_transform = C > 8  # narrow raw payloads ride the table directly
        payload = None
        feat_slices = None
        if features is not None and pre_transform:
            pres = [nn.Dense(h1[i], use_bias=False, name=f'pre_feat_{i}')(features)
                    for i in range(len(self.mlps))]
            payload = jnp.concatenate(pres, axis=-1)
            offs = [0]
            for h in h1:
                offs.append(offs[-1] + h)
            feat_slices = [(offs[i], offs[i + 1]) for i in range(len(h1))]
        elif features is not None:
            payload = features

        pr = self.pc_range
        assert pr is not None, 'fused SA needs the BEV pc_range'
        outs = sa_fused.fused_query_group(
            list(self.radii), list(self.nsamples), xyz, payload, new_xyz,
            tuple(pr), cap=self.bucket_cap, feat_slices=feat_slices)

        assert self.use_xyz or features is not None
        branch_feats = []
        for i, (rel, gfeat, _hit) in enumerate(outs):
            h = 0.0
            if features is not None:
                if pre_transform:
                    h = gfeat
                else:
                    h = nn.Dense(h1[i], use_bias=False, name=f'pre_feat_{i}')(gfeat)
            if self.use_xyz:
                h = h + nn.Dense(h1[i], use_bias=False, name=f'pre_xyz_{i}')(rel)
            h = nn.BatchNorm(use_running_average=not training, momentum=0.9,
                             epsilon=1e-5, name=f'bn0_{i}')(h)
            h = nn.relu(h)
            rest = list(self.mlps[i][1:])
            if rest:
                h = SharedMLP(rest, name=f'mlp_rest_{i}')(h, training=training)
            branch_feats.append(jnp.max(h, axis=2))
        return jnp.concatenate(branch_feats, axis=-1)


class SAModuleMSGFused(nn.Module):
    """Sampling + `SAGroupMLP`: the fused drop-in for `SAModuleMSG`.

    Numerically equivalent to `SAModuleMSG` up to the documented selection
    semantics of `ops/sa_fused.py` (bucket candidate order, cap drops,
    zero rows for empty balls) — see tests/test_sa_fused.py and
    tests/test_pointnet2_fused_module.py.
    """
    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    sample_method: str = 'fps'
    pc_range: Sequence[float] | None = None
    bucket_cap: int = 32

    @nn.compact
    def __call__(self, xyz, features, training: bool = False):
        if self.sample_method == 'random' and self.has_rng('sampling'):
            # true uniform subsample: fresh permutation per apply. Only taken
            # when the caller provides a 'sampling' rng; the default path
            # relies on host-side shuffle_points for uniformity (see class
            # docstring for the FPS-ordered-input caveat).
            perm = jax.random.permutation(
                self.make_rng('sampling'), xyz.shape[1])[:self.npoint]
            new_xyz = xyz[:, perm]
        elif self.sample_method in ('random', 'prefix'):
            new_xyz = xyz[:, :self.npoint]
        else:
            fps_idx = dispatch.farthest_point_sample(xyz, self.npoint)
            new_xyz = dispatch.gather_operation(xyz, fps_idx)
        out = SAGroupMLP(radii=self.radii, nsamples=self.nsamples,
                         mlps=self.mlps, use_xyz=self.use_xyz,
                         pc_range=self.pc_range, bucket_cap=self.bucket_cap,
                         name='agg')(xyz, features, new_xyz, training=training)
        return new_xyz, out


class FPModule(nn.Module):
    """Feature propagation: three-NN inverse-distance interpolation + unit MLP
    (`pointnet2_modules.py:122-170`)."""
    mlp: Sequence[int]

    @nn.compact
    def __call__(self, unknown, known, unknown_feats, known_feats, training: bool = False):
        dist2, idx = p2.three_nn(unknown, known)
        weight = p2.three_interpolate_weights(dist2)
        interp = p2.three_interpolate(known_feats, idx, weight)  # (B, n, C2)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return SharedMLP(self.mlp, name='mlp')(interp, training=training)


class PointNet2MSG(nn.Module):
    """Config-driven SA+FP ladder. model_cfg mirrors the reference YAML schema.

    Input batch keys: 'points' (B, N, 3+C).
    Output keys added: 'point_features' (B, Np, C'), 'point_coords' (B, Np, 3),
    plus 'sa_xyz'/'sa_features' pyramids for necks that tap intermediate levels.
    """
    model_cfg: Any
    input_channels: int  # 3 + C like the reference (xyz included)
    pc_range: Any = None  # (xmin, ymin, zmin, xmax, ymax, zmax)

    @property
    def num_point_features(self):
        fp = as_cfg(self.model_cfg).get('FP_MLPS', [])
        if len(fp) > 0:
            return fp[0][-1]
        ch = 0
        for mlps in as_cfg(self.model_cfg).SA_CONFIG.MLPS[-1]:
            ch += mlps[-1]
        return ch

    @nn.compact
    def __call__(self, batch: dict, training: bool = False) -> dict:
        points = batch['points']
        xyz = points[..., 0:3]
        features = points[..., 3:] if points.shape[-1] > 3 else None

        sa_cfg = as_cfg(self.model_cfg).SA_CONFIG
        methods = sa_cfg.get('SAMPLE_METHOD', ['fps'] * len(sa_cfg.NPOINTS))
        bev_range = None
        if self.pc_range is not None:
            r = list(self.pc_range)
            bev_range = (r[0], r[1], r[3], r[4])
        fused = bool(sa_cfg.get('FUSED', False)) and bev_range is not None
        # FPS prefix elision: an SA level whose input is the previous level's
        # FPS output (in pick order) gets identical samples from arange(npoint)
        # — see SAModuleMSG docstring for the exactness argument. Saves the
        # full serial FPS chain at every level after the first.
        prefix_ok = bool(sa_cfg.get('FPS_PREFIX', True))
        fps_ordered = False
        l_xyz, l_features = [xyz], [features]
        for k in range(len(sa_cfg.NPOINTS)):
            method = methods[k]
            # Elision and 'random' both take xyz[:, :npoint]; that is only a
            # valid subsample when npoint fits the level's (static) input
            # size — JAX slices silently clamp, whereas real FPS would emit
            # npoint duplicated picks. Guard at trace time.
            npoint_fits = sa_cfg.NPOINTS[k] <= l_xyz[k].shape[1]
            if method == 'fps' and fps_ordered and prefix_ok and npoint_fits:
                method = 'prefix'
            if method == 'random' and fps_ordered and \
                    not self.has_rng('sampling'):
                # without an rng, prefix-of-FPS-order is NOT uniform — name
                # the path honestly and say so (ADVICE r3)
                import warnings
                warnings.warn(
                    f"SA level {k}: SAMPLE_METHOD 'random' on an FPS-ordered "
                    "input degenerates to a deterministic FPS prefix; pass a "
                    "'sampling' rng to model.apply for true uniform sampling "
                    "(using 'prefix' semantics).", stacklevel=2)
                method = 'prefix'
            if method == 'random' and not npoint_fits:
                raise ValueError(
                    f"SA level {k}: SAMPLE_METHOD 'random' with NPOINTS="
                    f"{sa_cfg.NPOINTS[k]} > input size {l_xyz[k].shape[1]}; "
                    f"use 'fps' (duplicating picks) or shrink NPOINTS.")
            mlps = [list(m) for m in sa_cfg.MLPS[k]]
            if fused:
                sa = SAModuleMSGFused(
                    npoint=sa_cfg.NPOINTS[k], radii=sa_cfg.RADIUS[k],
                    nsamples=sa_cfg.NSAMPLE[k], mlps=mlps,
                    use_xyz=sa_cfg.get('USE_XYZ', True),
                    sample_method=method, pc_range=bev_range,
                    bucket_cap=int(sa_cfg.get('BUCKET_CAP', 32)),
                    name=f'sa_{k}')
            else:
                sa = SAModuleMSG(
                    npoint=sa_cfg.NPOINTS[k], radii=sa_cfg.RADIUS[k],
                    nsamples=sa_cfg.NSAMPLE[k], mlps=mlps,
                    use_xyz=sa_cfg.get('USE_XYZ', True),
                    sample_method=method, pc_range=bev_range, name=f'sa_{k}')
            li_xyz, li_features = sa(l_xyz[k], l_features[k], training=training)
            # 'fps' outputs pick order; 'prefix'/'random' preserve an already
            # FPS-ordered input (a prefix of a farthest-first order is one).
            fps_ordered = (method == 'fps') or \
                (fps_ordered and method in ('prefix', 'random'))
            l_xyz.append(li_xyz)
            l_features.append(li_features)

        fp_mlps = as_cfg(self.model_cfg).get('FP_MLPS', [])
        n_fp = len(fp_mlps)
        for i in range(-1, -(n_fp + 1), -1):
            fp = FPModule(mlp=list(fp_mlps[i]), name=f'fp_{n_fp + i}')
            l_features[i - 1] = fp(l_xyz[i - 1], l_xyz[i], l_features[i - 1],
                                   l_features[i], training=training)

        if n_fp > 0:
            batch['point_features'] = l_features[0]
            batch['point_coords'] = l_xyz[0]
        else:
            batch['point_features'] = l_features[-1]
            batch['point_coords'] = l_xyz[-1]
        batch['sa_xyz'] = l_xyz
        batch['sa_features'] = l_features
        return batch
