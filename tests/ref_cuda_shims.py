"""Clean-room CPU shims for the reference's iou3d_nms and roipoint_pool3d
CUDA extensions, written from the kernel contracts — completing the shim
family (`ref_pointnet2_shim`, `ref_spconv_shim`) so the full PointRCNN
torch stack runs as a CPU oracle.

* `nms_gpu` (`iou3d_nms_kernel.cu:295-350`): greedy bitmask NMS over
  score-sorted boxes, suppressing on rotated BEV IoU > thresh. The IoU is
  the repo's numpy Sutherland-Hodgman oracle (`utils/np_iou.py`), itself
  parity-tested against the reference clipping math.
* `roipoint_pool3d.forward` (`roipoint_pool3d_kernel.cu:26-130`):
  per-(box, point) rotated containment with MARGIN=1e-5, first
  `num_sampled` in-box points in point order, cyclic duplication when
  fewer, empty flag when none.

Register with `install()` AFTER `ref_oracle.install()` (the stub modules
must exist so the attributes land on them).
"""
from __future__ import annotations

import sys

import numpy as np
import torch

from pdm_ssd_tpu.utils.np_iou import boxes_bev_overlap_cpu


def _nms_gpu(boxes: torch.Tensor, keep: torch.Tensor, thresh: float) -> int:
    """boxes (N, 7) ALREADY score-sorted; fills keep, returns num_out."""
    b = boxes.detach().numpy().astype(np.float32)
    n = len(b)
    if n == 0:
        return 0
    inter = boxes_bev_overlap_cpu(b[:, :7], b[:, :7])
    areas = b[:, 3] * b[:, 4]
    iou = inter / np.maximum(areas[:, None] + areas[None, :] - inter, 1e-8)
    suppressed = np.zeros(n, bool)
    out = []
    for i in range(n):
        if suppressed[i]:
            continue
        out.append(i)
        suppressed |= iou[i] > thresh
        suppressed[i] = True
    keep[:len(out)] = torch.tensor(out, dtype=keep.dtype)
    return len(out)


def _roipool3d_forward(points, pooled_boxes3d, point_features,
                       pooled_features, pooled_empty_flag):
    """points (B, N, 3); pooled_boxes3d (B, M, 7) ALREADY enlarged;
    point_features (B, N, C); outputs written in place:
    pooled_features (B, M, K, 3+C), pooled_empty_flag (B, M) int."""
    B, N = points.shape[:2]
    M = pooled_boxes3d.shape[1]
    K = pooled_features.shape[2]
    pts = points.numpy()
    boxes = pooled_boxes3d.numpy()
    feats = point_features.numpy()
    for b in range(B):
        for m in range(M):
            cx, cy, cz, dx, dy, dz, rz = boxes[b, m, :7]
            sh = pts[b] - [cx, cy, cz]
            cosa, sina = np.cos(-rz), np.sin(-rz)
            lx = sh[:, 0] * cosa - sh[:, 1] * sina
            ly = sh[:, 0] * sina + sh[:, 1] * cosa
            inside = ((np.abs(sh[:, 2]) <= dz / 2.0)
                      & (np.abs(lx) < dx / 2.0 + 1e-5)
                      & (np.abs(ly) < dy / 2.0 + 1e-5))
            idx = np.nonzero(inside)[0][:K]
            if len(idx) == 0:
                pooled_empty_flag[b, m] = 1
                continue
            full = idx[np.arange(K) % len(idx)]
            row = np.concatenate([pts[b][full], feats[b][full]], axis=1)
            pooled_features[b, m] = torch.from_numpy(row)
    return 0


def install():
    """Attach the emulations to the stub extension modules."""
    nms_mod = sys.modules.get('pcdet.ops.iou3d_nms.iou3d_nms_cuda')
    if nms_mod is not None:
        nms_mod.nms_gpu = _nms_gpu
    pool_mod = sys.modules.get('pcdet.ops.roipoint_pool3d.roipoint_pool3d_cuda')
    if pool_mod is not None:
        pool_mod.forward = _roipool3d_forward
