"""Evaluation loop: jitted batched inference -> KITTI mAP.

Replaces `tools/eval_utils/eval_utils.py:22-141`: per-batch jitted predict,
recall statistics against GT, `generate_prediction_dicts` on host, result.pkl
dump, `dataset.evaluation()`. Metric merging across processes is unnecessary —
detections come back from the sharded predict already gathered.
"""
from __future__ import annotations

import pickle
import time

import jax
import numpy as np

from ..ops import iou3d
from ..parallel import make_mesh, pad_batch_to, padded_batch_size, shard_batch
from .trainer import make_predict_step, _filter_device_batch


def _recall_counts(pred_boxes, pred_mask, gt_boxes, gt_mask, thresh_list):
    """Per-sample recall bookkeeping (`detector3d_template.generate_recall_record
    :286-328` analog), computed on host with the jax IoU kernel."""
    counts = {f'recall_{t}': 0 for t in thresh_list}
    gt_num = 0
    B = pred_boxes.shape[0]
    for b in range(B):
        gts = gt_boxes[b][gt_mask[b]][:, :7]
        preds = pred_boxes[b][pred_mask[b]][:, :7]
        gt_num += len(gts)
        if len(gts) == 0 or len(preds) == 0:
            continue
        iou = np.asarray(iou3d.boxes_iou3d(gts.astype(np.float32),
                                           preds.astype(np.float32)))
        best = iou.max(axis=1)
        for t in thresh_list:
            counts[f'recall_{t}'] += int((best > t).sum())
    return counts, gt_num


def eval_one_epoch(model, params, batch_stats, dataloader, dataset, class_names,
                   logger=None, result_dir=None, thresh_list=(0.3, 0.5, 0.7),
                   host_prepare=None):
    mesh = None
    predict = make_predict_step(model)
    det_annos = []
    recall_totals = {f'recall_{t}': 0 for t in thresh_list}
    total_gt = 0
    infer_time = 0.0
    n_frames = 0

    pad_b = None
    from .prefetch import prefetch_batches
    for i, batch in enumerate(prefetch_batches(dataloader, host_prepare)):
        real_b = batch['batch_size']
        if mesh is None:
            # full mesh + batch padding: every chip stays busy, and the final
            # partial batch (drop_last=False) is padded up to the same static
            # shape (wraparound samples, sliced off below) instead of crashing
            # the NamedSharding or triggering a recompile.
            mesh = make_mesh()
            pad_b = padded_batch_size(real_b, mesh)
        device_batch = _filter_device_batch(batch)
        if real_b < pad_b:
            device_batch = pad_batch_to(device_batch, pad_b)
        device_batch = shard_batch(device_batch, mesh)
        t0 = time.perf_counter()
        dets = predict(params, batch_stats, device_batch)
        dets = jax.device_get(dets)
        infer_time += time.perf_counter() - t0
        n_frames += real_b
        dets = {k: v[:real_b] for k, v in dets.items()}

        counts, gt_num = _recall_counts(
            dets['pred_boxes'], dets['pred_mask'],
            batch['gt_boxes'], batch['gt_mask'], thresh_list) \
            if 'gt_boxes' in batch else ({}, 0)
        for k, v in counts.items():
            recall_totals[k] += v
        total_gt += gt_num

        pred_dicts = [
            {k: dets[k][b] for k in ['pred_boxes', 'pred_scores', 'pred_labels', 'pred_mask']}
            for b in range(batch['batch_size'])]
        det_annos += dataset.generate_prediction_dicts(
            batch, pred_dicts, class_names,
            output_path=result_dir / 'final_result/data' if result_dir else None)
        if logger and i % 50 == 0:
            logger.info(f'eval batch {i}/{len(dataloader)}')

    ret_dict = {}
    for t in thresh_list:
        ret_dict[f'recall/rcnn_{t}'] = recall_totals[f'recall_{t}'] / max(total_gt, 1)
    sec_per_example = infer_time / max(n_frames, 1)
    if logger:
        logger.info(f'Generate label finished(sec_per_example: {sec_per_example:.4f} s)')
        for t in thresh_list:
            logger.info(f"recall_rcnn_{t}: {ret_dict[f'recall/rcnn_{t}']:.4f}")

    if result_dir is not None:
        with open(result_dir / 'result.pkl', 'wb') as f:
            pickle.dump(det_annos, f)

    result_str, result_dict = dataset.evaluation(det_annos, class_names)
    if logger and result_str:
        logger.info(result_str)
    ret_dict.update(result_dict)
    ret_dict['infer_fps'] = 1.0 / max(sec_per_example, 1e-9)
    return ret_dict
