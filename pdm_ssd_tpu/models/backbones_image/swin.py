"""SwinTransformer image backbone, NHWC flax.

Re-design of the reference `SwinTransformer`
(`pcdet/models/backbones_image/swin.py`, 736 LoC + `swin_utils`): patch
embedding, stages of (shifted-)window multi-head attention blocks with
relative position bias and MLPs, patch merging between stages. Windows are
static reshapes on the padded grid; the cyclic shift is `jnp.roll` with an
attention mask built from the window-id map (same construction as the
reference's `img_mask`).
"""
from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ...utils.config import as_cfg


class WindowAttention(nn.Module):
    dim: int
    window: int
    num_heads: int

    @nn.compact
    def __call__(self, x, mask=None):
        """x: (nW, S, C) windows; mask: (nW, S, S) additive or None."""
        S = self.window * self.window
        nW, _, C = x.shape
        h = self.num_heads
        qkv = nn.Dense(3 * self.dim, name='qkv')(x).reshape(nW, S, 3, h,
                                                            self.dim // h)
        q, k, v = (qkv[:, :, i].transpose(0, 2, 1, 3) for i in range(3))
        attn = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(self.dim // h)

        # relative position bias (reference swin `relative_position_bias_table`)
        w = self.window
        table = self.param('rel_bias', nn.initializers.normal(0.02),
                           ((2 * w - 1) ** 2, h))
        coords = np.stack(np.meshgrid(np.arange(w), np.arange(w),
                                      indexing='ij'), -1).reshape(-1, 2)
        rel = coords[:, None] - coords[None, :] + (w - 1)
        idx = rel[..., 0] * (2 * w - 1) + rel[..., 1]
        bias = table[jnp.asarray(idx.reshape(-1))].reshape(S, S, h)
        attn = attn + bias.transpose(2, 0, 1)[None]

        if mask is not None:
            attn = attn + mask[:, None]
        attn = nn.softmax(attn, axis=-1)
        out = (attn @ v).transpose(0, 2, 1, 3).reshape(nW, S, self.dim)
        return nn.Dense(self.dim, name='proj')(out)


class SwinBlock(nn.Module):
    dim: int
    num_heads: int
    window: int
    shift: int
    drop_path: float = 0.0

    def _drop_path(self, x, training):
        """Stochastic depth on the residual branch (reference swin_utils
        DropPath): per-sample Bernoulli keep, rescaled. Identity at eval or
        when no 'dropout' rng is provided."""
        if not training or self.drop_path <= 0 or not self.has_rng('dropout'):
            return x
        keep = 1.0 - self.drop_path
        mask = jax.random.bernoulli(self.make_rng('dropout'), keep,
                                    (x.shape[0], 1, 1, 1))
        return x * mask.astype(x.dtype) / keep

    @nn.compact
    def __call__(self, x, training: bool = False):
        """x: (B, H, W, C); H, W are window multiples."""
        B, H, W, C = x.shape
        w = self.window
        shortcut = x
        x = nn.LayerNorm(name='ln1')(x)
        if self.shift:
            x = jnp.roll(x, (-self.shift, -self.shift), axis=(1, 2))

        xw = x.reshape(B, H // w, w, W // w, w, C)
        xw = xw.transpose(0, 1, 3, 2, 4, 5).reshape(-1, w * w, C)

        mask = None
        if self.shift:
            # window-id map -> pairwise -inf across cyclic-shift seams
            ids = np.zeros((H, W), np.int32)
            cnt = 0
            for hs in (slice(0, -w), slice(-w, -self.shift),
                       slice(-self.shift, None)):
                for ws in (slice(0, -w), slice(-w, -self.shift),
                           slice(-self.shift, None)):
                    ids[hs, ws] = cnt
                    cnt += 1
            ids = np.roll(ids, (-self.shift, -self.shift), axis=(0, 1))
            idw = ids.reshape(H // w, w, W // w, w).transpose(0, 2, 1, 3)
            idw = idw.reshape(-1, w * w)
            m = (idw[:, :, None] != idw[:, None, :]) * -100.0
            mask = jnp.asarray(np.tile(m, (B, 1, 1)), jnp.float32)

        xw = WindowAttention(self.dim, w, self.num_heads, name='attn')(xw, mask)
        x = xw.reshape(B, H // w, W // w, w, w, C)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(B, H, W, C)
        if self.shift:
            x = jnp.roll(x, (self.shift, self.shift), axis=(1, 2))
        x = shortcut + self._drop_path(x, training)

        h = nn.LayerNorm(name='ln2')(x)
        h = nn.Dense(4 * self.dim, name='mlp1')(h)
        # exact (erf) GELU — torch's default, and what reference checkpoints
        # were trained with; flax defaults to the tanh approximation
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(self.dim, name='mlp2')(h)
        return x + self._drop_path(h, training)


class SwinTransformer(nn.Module):
    """Config: EMBED_DIM, DEPTHS (per stage, e.g. the reference-scope
    [2, 2, 6, 2]), NUM_HEADS (per stage), WINDOW_SIZE, PATCH_SIZE,
    DROP_PATH_RATE (stochastic depth, linearly increasing over blocks),
    and either OUT_CHANNEL (folded 2-level FPN fuse, single /8 output — the
    compact default) or RETURN_PYRAMID + OUT_INDICES (multi-scale stage
    outputs for a standalone neck such as `GeneralizedLSSFPN`)."""
    model_cfg: Any

    @property
    def out_channels(self):
        return as_cfg(self.model_cfg).get('OUT_CHANNEL', 256)

    @nn.compact
    def __call__(self, images, training: bool = False):
        """(B, N, H, W, 3) -> (B, N, H//8, W//8, OUT_CHANNEL)."""
        cfg = as_cfg(self.model_cfg)
        embed = int(cfg.get('EMBED_DIM', 96))
        depths = list(cfg.get('DEPTHS', [2, 2, 2]))
        heads = list(cfg.get('NUM_HEADS', [3, 6, 12]))
        win = int(cfg.get('WINDOW_SIZE', 4))
        patch = int(cfg.get('PATCH_SIZE', 2))

        drop_path_rate = float(cfg.get('DROP_PATH_RATE', 0.0))
        total_blocks = max(sum(depths), 1)
        dpr = np.linspace(0, drop_path_rate, total_blocks)

        B, N, H, W, _ = images.shape
        x = images.reshape(B * N, H, W, 3)
        x = nn.Conv(embed, (patch, patch), strides=(patch, patch),
                    name='patch_embed')(x)
        x = nn.LayerNorm(name='patch_ln')(x)

        feats = []
        dim = embed
        blk = 0
        for si, (depth, nh) in enumerate(zip(depths, heads)):
            # pad to window multiples
            _, h_, w_, _ = x.shape
            ph, pw = (-h_) % win, (-w_) % win
            if ph or pw:
                x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
            for bi in range(depth):
                x = SwinBlock(dim, nh, win, (win // 2) if bi % 2 else 0,
                              drop_path=float(dpr[blk]),
                              name=f's{si}_b{bi}')(x, training=training)
                blk += 1
            x = x[:, :h_, :w_]
            feats.append(x)
            if si < len(depths) - 1:
                # patch merging: 2x2 concat + linear reduction
                _, h_, w_, _ = x.shape
                x = x[:, :h_ - h_ % 2, :w_ - w_ % 2]
                x = x.reshape(x.shape[0], x.shape[1] // 2, 2,
                              x.shape[2] // 2, 2, dim)
                x = x.transpose(0, 1, 3, 2, 4, 5).reshape(
                    x.shape[0], x.shape[1], x.shape[3], 4 * dim)
                dim *= 2
                x = nn.Dense(dim, name=f'merge{si}')(nn.LayerNorm(
                    name=f'merge_ln{si}')(x))

        if cfg.get('RETURN_PYRAMID', False):
            # multi-scale stage outputs for a standalone neck; OUT_NORM adds
            # the reference's per-output LayerNorms (swin.py `norm{i}`
            # add_module at :608-613) for checkpoint compatibility
            out_idx = [int(i) for i in
                       cfg.get('OUT_INDICES', range(len(depths)))]
            outs = []
            for i in out_idx:
                f = feats[i]
                if cfg.get('OUT_NORM', False):
                    f = nn.LayerNorm(name=f'out_norm{i}')(f)
                outs.append(f.reshape(B, N, *f.shape[1:]))
            return outs

        # FPN fusion, output at the deepest (1/8) level: the finer stage's
        # lateral is pooled down and added (patch 2 * 2 merges -> /8)
        out_ch = self.out_channels
        top = nn.Dense(out_ch, name='lat_top')(feats[-1])
        lat = nn.Dense(out_ch, name='lat_mid')(feats[-2])
        lat_dn = nn.avg_pool(lat, (2, 2), strides=(2, 2), padding='SAME')
        lat_dn = lat_dn[:, :top.shape[1], :top.shape[2]]
        top = nn.Conv(out_ch, (3, 3), padding=1, name='fpn_out')(top + lat_dn)
        _, h8, w8, _ = top.shape
        return top.reshape(B, N, h8, w8, out_ch)
