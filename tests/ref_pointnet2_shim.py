"""Clean-room torch-CPU implementations of the reference's pointnet2_batch
CUDA wrappers, so the reference's OWN torch modules (`pointnet2_modules.py`,
`pointnet2_backbone.py`) can run as a parity oracle without a GPU.

Semantics transcribed from the kernel contracts (not the code): FPS seeds at
index 0 with strict-greater argmax updates (`sampling_gpu.cu:100-140`); ball
query returns the first `nsample` in-radius indices in point order with
first-hit backfill and strict `d2 < r^2` (`ball_query_gpu.cu:15-51`); three_nn
returns the 3 smallest squared distances in ascending order
(`interpolate_gpu.cu`). Everything is vectorized torch — no per-point Python
loops beyond the inherently serial FPS chain.

Register with `install()` BEFORE `ref_oracle.load`ing any pointnet2 consumer.
"""
from __future__ import annotations

import sys
import types

import torch


def _fps_indices(xyz: torch.Tensor, npoint: int) -> torch.Tensor:
    B, N, _ = xyz.shape
    dist = torch.full((B, N), 1e10, dtype=torch.float32)
    out = torch.zeros(B, npoint, dtype=torch.int32)
    last = torch.zeros(B, dtype=torch.long)
    for j in range(1, npoint):
        lastxyz = xyz[torch.arange(B), last]                     # (B, 3)
        d = ((xyz - lastxyz[:, None]) ** 2).sum(-1)              # (B, N)
        dist = torch.minimum(dist, d)
        last = dist.argmax(-1)                                   # first max
        out[:, j] = last.int()
    return out


def farthest_point_sampling_wrapper(B, N, npoint, xyz, temp, output):
    output.copy_(_fps_indices(xyz.view(B, N, 3), npoint))
    return 1


def gather_points_wrapper(B, C, N, npoint, features, idx, output):
    # features (B, C, N), idx (B, npoint) -> output (B, C, npoint)
    output.copy_(torch.gather(
        features, 2, idx.long().unsqueeze(1).expand(B, C, npoint)))
    return 1


def ball_query_wrapper(B, N, M, radius, nsample, new_xyz, xyz, idx):
    xyz = xyz.view(B, N, 3)
    new_xyz = new_xyz.view(B, M, 3)
    d2 = ((new_xyz[:, :, None] - xyz[:, None]) ** 2).sum(-1)     # (B, M, N)
    within = d2 < radius * radius
    first = within.int().argmax(-1)                              # 0 when empty
    out = first[..., None].expand(B, M, nsample).int().contiguous()
    rank = within.cumsum(-1) - 1                                 # hit ordinal
    sel = within & (rank < nsample)
    b_i, m_i, n_i = sel.nonzero(as_tuple=True)
    out[b_i, m_i, rank[b_i, m_i, n_i]] = n_i.int()
    # empty balls keep the preallocated zeros (CUDA leaves idx untouched)
    out[~within.any(-1)] = 0
    idx.copy_(out)
    return 1


def group_points_wrapper(B, C, N, npoints, nsample, features, idx, output):
    # features (B, C, N), idx (B, npoints, nsample) -> (B, C, npoints, nsample)
    flat = idx.long().view(B, 1, npoints * nsample).expand(B, C, -1)
    output.copy_(torch.gather(features, 2, flat).view(B, C, npoints, nsample))
    return 1


def three_nn_wrapper(B, N, M, unknown, known, dist2, idx):
    # unknown (B, N, 3), known (B, M, 3) -> dist2/idx (B, N, 3)
    d2 = ((unknown.view(B, N, 3)[:, :, None] -
           known.view(B, M, 3)[:, None]) ** 2).sum(-1)           # (B, N, M)
    vals, inds = torch.topk(d2, k=3, dim=-1, largest=False, sorted=True)
    dist2.copy_(vals)
    idx.copy_(inds.int())
    return 1


def three_interpolate_wrapper(B, C, M, N, features, idx, weight, output):
    # features (B, C, M), idx/weight (B, N, 3) -> output (B, C, N)
    g = torch.gather(features, 2,
                     idx.long().view(B, 1, N * 3).expand(B, C, -1))
    output.copy_((g.view(B, C, N, 3) * weight.view(B, 1, N, 3)).sum(-1))
    return 1


_ORIG_CUDA_TENSORS = {}


def _host_alloc(dtype):
    def alloc(*s):
        # Emulate only where CUDA is genuinely absent (this image's torch is
        # CPU-only, so the original constructors could never succeed). On a
        # machine with real CUDA, fail loudly rather than silently handing
        # CPU tensors to code that expected device allocations.
        if torch.cuda.is_available():
            raise RuntimeError(
                'ref_pointnet2_shim: torch.cuda.*Tensor patched for CPU '
                'emulation, but real CUDA is available — call uninstall() '
                'or scope the shim away from CUDA-dependent tests.')
        return torch.empty(*s, dtype=dtype)
    return alloc


def install():
    """Register the shim as the compiled extension module, and route the
    reference Functions' `torch.cuda.IntTensor/FloatTensor` output
    allocations (`pointnet2_utils.py:25,55,93,...`) to host tensors.
    Reversible via `uninstall()`; the patched constructors refuse to run if
    real CUDA is present (see `_host_alloc`)."""
    name = 'pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda'
    mod = types.ModuleType(name)
    for fn in (farthest_point_sampling_wrapper, gather_points_wrapper,
               ball_query_wrapper, group_points_wrapper, three_nn_wrapper,
               three_interpolate_wrapper):
        setattr(mod, fn.__name__, fn)
    sys.modules[name] = mod
    if not _ORIG_CUDA_TENSORS:
        _ORIG_CUDA_TENSORS['IntTensor'] = torch.cuda.IntTensor
        _ORIG_CUDA_TENSORS['FloatTensor'] = torch.cuda.FloatTensor
    torch.cuda.IntTensor = _host_alloc(torch.int32)
    torch.cuda.FloatTensor = _host_alloc(torch.float32)
    return mod


def uninstall():
    """Restore the original `torch.cuda.*Tensor` constructors."""
    if _ORIG_CUDA_TENSORS:
        torch.cuda.IntTensor = _ORIG_CUDA_TENSORS.pop('IntTensor')
        torch.cuda.FloatTensor = _ORIG_CUDA_TENSORS.pop('FloatTensor')
