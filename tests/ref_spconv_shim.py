"""Pure-torch spconv emulation for reference-oracle parity tests.

spconv's submanifold / strided sparse convolutions are exactly emulatable on
tiny grids with dense `F.conv3d` + active-site masking:

  * `SubMConv3d` k3: output sites = input sites; a dense conv (padding k//2)
    over a zero-filled dense volume, SAMPLED at the active sites, equals the
    sparse op (inactive cells are zero and contribute nothing).
  * `SparseConv3d` k s p: active output sites = all cells whose receptive
    field covers >= 1 input site (the spconv rulebook's output set); dense
    strided conv sampled there.
  * `SparseInverseConv3d`: outputs at the indices recorded under the paired
    strided conv's `indice_key`; dense `F.conv_transpose3d` sampled there.

Features stay as (N, C) rows + (N, 4) [b, z, y, x] indices (the real spconv
tensor layout), so BatchNorm1d/ReLU-over-`.features` semantics — stats over
ACTIVE rows only — are preserved exactly. This converts the reference's
spconv-dependent model families (`pcdet/models/backbones_3d/
spconv_backbone.py:70-180`, `spconv_unet.py`) into runnable CPU oracles the
same way `ref_pointnet2_shim` does for the pointnet2 CUDA kernels.

Register with `install()` BEFORE `ref_oracle.load`ing any spconv consumer
(`ref_oracle.install` otherwise stubs `spconv.pytorch` with inert classes).
"""
from __future__ import annotations

import sys
import types

import torch
import torch.nn as nn
import torch.nn.functional as F


class SparseConvTensor:
    """Minimal spconv-2.x tensor: (N, C) features + (N, 4) [b,z,y,x] int
    indices + spatial shape; `indice_dict` carries the per-indice_key
    downsample records the inverse conv consumes."""

    def __init__(self, features, indices, spatial_shape, batch_size,
                 indice_dict=None):
        self.features = features
        self.indices = indices
        self.spatial_shape = list(int(s) for s in spatial_shape)
        self.batch_size = int(batch_size)
        self.indice_dict = dict(indice_dict or {})

    def replace_feature(self, new_features):
        return SparseConvTensor(new_features, self.indices,
                                self.spatial_shape, self.batch_size,
                                self.indice_dict)

    def dense(self, channels_first=True):
        D, H, W = self.spatial_shape
        C = self.features.shape[1]
        out = self.features.new_zeros(self.batch_size, C, D, H, W)
        ii = self.indices.long()
        out[ii[:, 0], :, ii[:, 1], ii[:, 2], ii[:, 3]] = self.features
        return out


def _triple(v):
    return tuple(v) if isinstance(v, (tuple, list)) else (v, v, v)


class _SparseConvBase(nn.Module):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=0, bias=True, indice_key=None):
        super().__init__()
        self.in_channels = in_channels
        self.out_channels = out_channels
        self.kernel_size = _triple(kernel_size)
        self.stride = _triple(stride)
        self.padding = _triple(padding)
        self.indice_key = indice_key
        # dense conv layout (out, in, kz, ky, kx); tap order matches the
        # JAX builder's meshgrid enumeration (z outer, x inner)
        w = torch.empty(out_channels, in_channels, *self.kernel_size)
        nn.init.kaiming_uniform_(w, a=5 ** 0.5)
        self.weight = nn.Parameter(w)
        self.bias = nn.Parameter(torch.zeros(out_channels)) if bias else None


class SubMConv3d(_SparseConvBase):
    def __init__(self, in_channels, out_channels, kernel_size, stride=1,
                 padding=None, bias=True, indice_key=None):
        ks = _triple(kernel_size)
        pad = tuple(k // 2 for k in ks) if padding is None else padding
        super().__init__(in_channels, out_channels, ks, stride, pad, bias,
                         indice_key)

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        d = x.dense()
        out = F.conv3d(d, self.weight, self.bias, stride=1,
                       padding=self.padding)
        ii = x.indices.long()
        feats = out[ii[:, 0], :, ii[:, 1], ii[:, 2], ii[:, 3]]
        return x.replace_feature(feats)


def _down_indices(indices, spatial_shape, ksize, stride, pad):
    """Active output sites of a strided sparse conv (the rulebook's output
    set), sorted by (b, z, y, x) flat key — deterministic, matching the
    repo's host builder convention."""
    dims_out = [(d + 2 * p - k) // s + 1
                for d, k, s, p in zip(spatial_shape, ksize, stride, pad)]
    ii = indices.long()
    outs = []
    for ax in range(3):
        k, s, p = ksize[ax], stride[ax], pad[ax]
        num = ii[:, ax + 1, None] + p - torch.arange(k)[None, :]
        ok = (num % s == 0) & (num >= 0)
        o = torch.div(num, s, rounding_mode='floor')
        ok &= o < dims_out[ax]
        outs.append((o, ok))
    oz, okz = outs[0]
    oy, oky = outs[1]
    ox, okx = outs[2]
    z = oz[:, :, None, None]
    y = oy[:, None, :, None]
    x = ox[:, None, None, :]
    ok = okz[:, :, None, None] & oky[:, None, :, None] & okx[:, None, None, :]
    b = ii[:, 0, None, None, None].expand(ok.shape)
    flat = ((b * dims_out[0] + z) * dims_out[1] + y) * dims_out[2] + x
    uniq = torch.unique(flat[ok])
    ob = uniq // (dims_out[0] * dims_out[1] * dims_out[2])
    rem = uniq % (dims_out[0] * dims_out[1] * dims_out[2])
    oz_ = rem // (dims_out[1] * dims_out[2])
    oy_ = (rem // dims_out[2]) % dims_out[1]
    ox_ = rem % dims_out[2]
    out_idx = torch.stack([ob, oz_, oy_, ox_], -1).int()
    return out_idx, dims_out


class SparseConv3d(_SparseConvBase):
    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        out_idx, dims_out = _down_indices(x.indices, x.spatial_shape,
                                          self.kernel_size, self.stride,
                                          self.padding)
        d = x.dense()
        out = F.conv3d(d, self.weight, self.bias, stride=self.stride,
                       padding=self.padding)
        ii = out_idx.long()
        feats = out[ii[:, 0], :, ii[:, 1], ii[:, 2], ii[:, 3]]
        y = SparseConvTensor(feats, out_idx, dims_out, x.batch_size,
                             x.indice_dict)
        if self.indice_key is not None:
            y.indice_dict[self.indice_key] = (
                x.indices, list(x.spatial_shape), self.kernel_size,
                self.stride, self.padding)
        return y


class SparseInverseConv3d(_SparseConvBase):
    """Outputs at the indices recorded under `indice_key` by the paired
    SparseConv3d (spconv's transposed-rulebook reuse,
    `spconv_unet.py:114`). Dense emulation: conv_transpose3d sampled at the
    recorded fine sites."""

    def __init__(self, in_channels, out_channels, kernel_size,
                 indice_key=None, bias=True):
        super().__init__(in_channels, out_channels, kernel_size, 1, 0, bias,
                         indice_key)

    def forward(self, x: SparseConvTensor) -> SparseConvTensor:
        rec = x.indice_dict[self.indice_key]
        fine_idx, fine_shape, ksize, stride, pad = rec
        d = x.dense()
        # exact ADJOINT of the recorded SparseConv3d:
        # out[j] = sum_{i, t : i*s - p + t = j} in[i] @ W[t], which is
        # F.conv_transpose3d with weight laid out (in, out, kz, ky, kx)
        # (torch's ConvTranspose IS the conv gradient — no extra flip).
        # Consumers porting weights from a tap-flip-stored decoder (the
        # repo's `invert_down_map` convention) reverse the tap order.
        # the strided conv floor-truncates, so the natural transpose extent
        # (in-1)*s - 2p + k can undershoot the fine shape; `output_padding`
        # restores the high-edge cells WITH their true contributions (they
        # are read by the last coarse cell's high taps — zero-padding here
        # silently dropped 9/60 fine rows on a 16->8 y-dim, measured).
        natural = [(d.size(2 + ax) - 1) * stride[ax] - 2 * pad[ax]
                   + ksize[ax] for ax in range(3)]
        opad = tuple(max(0, min(stride[ax] - 1,
                                fine_shape[ax] - natural[ax]))
                     for ax in range(3))
        out = F.conv_transpose3d(d, self.weight.transpose(0, 1),
                                 self.bias, stride=stride, padding=pad,
                                 output_padding=opad)
        out = out[:, :, :fine_shape[0], :fine_shape[1], :fine_shape[2]]
        ii = fine_idx.long()
        feats = out[ii[:, 0], :, ii[:, 1], ii[:, 2], ii[:, 3]]
        return SparseConvTensor(feats, fine_idx, fine_shape, x.batch_size,
                                x.indice_dict)


class SparseModule(nn.Module):
    pass


class SparseSequential(nn.Sequential):
    """Applies sparse-conv children to the tensor and dense children
    (BatchNorm1d / ReLU / ...) to `.features` — spconv 2.x behavior."""

    def forward(self, x):
        for m in self:
            if isinstance(x, SparseConvTensor) and not isinstance(
                    m, (_SparseConvBase, SparseSequential, SparseModule)):
                x = x.replace_feature(m(x.features))
            else:
                x = m(x)
        return x


class SparseMaxPool3d(nn.Module):
    def __init__(self, *a, **k):
        super().__init__()
        raise NotImplementedError('SparseMaxPool3d not needed by the oracle')


def install():
    """Replace ref_oracle's inert spconv stubs with the functional shim.
    Idempotent; call before `ref_oracle.load` of any spconv consumer."""
    spconv = sys.modules.get('spconv') or types.ModuleType('spconv')
    sys.modules['spconv'] = spconv
    spconv.__version__ = '2.3.6'
    spconv.constants = types.SimpleNamespace(SPCONV_USE_DIRECT_TABLE=False)
    sp = sys.modules.get('spconv.pytorch') or types.ModuleType(
        'spconv.pytorch')
    sys.modules['spconv.pytorch'] = sp
    spconv.pytorch = sp
    for cls in (SparseConvTensor, SubMConv3d, SparseConv3d,
                SparseInverseConv3d, SparseModule, SparseSequential,
                SparseMaxPool3d):
        setattr(sp, cls.__name__, cls)
    sp._functional_shim = True        # ref_oracle.install respects this
    # spconv_utils type-checks isinstance(child, spconv.conv.SparseConvolution)
    conv_mod = types.ModuleType('spconv.pytorch.conv')
    conv_mod.SparseConvolution = _SparseConvBase
    sys.modules['spconv.pytorch.conv'] = conv_mod
    sp.conv = conv_mod
    return sp
