"""Metric-oracle hardening (VERDICT r2 item 8): 200-trial randomized fuzz of
the Waymo AP/APH and nuScenes mAP/NDS implementations against
independently-written brute-force references — exhaustive-enumeration
matching and per-threshold O(n^2) python loops instead of the production
vectorized/scipy paths. (Rotated-IoU itself is oracle-tested separately in
test_iou3d.py; both sides share it here so the fuzz isolates the protocol.)
"""
import itertools

import numpy as np
import pytest

from pdm_ssd_tpu.datasets.waymo.waymo_eval import (
    evaluate_waymo, _iou3d, _wrap)
from pdm_ssd_tpu.datasets.nuscenes.nuscenes_eval import (
    evaluate_nuscenes, _aligned_iou3d, _yaw_diff,
    DIST_THRESHOLDS, TP_THRESHOLD, MIN_RECALL, MIN_PRECISION, N_INTERP)


# ---------------- brute-force Waymo ----------------

def brute_match(gb, pb, thr):
    """Exhaustive assignment maximizing total above-threshold IoU."""
    if len(gb) == 0 or len(pb) == 0:
        return []
    iou = _iou3d(gb, pb)
    gain = np.where(iou > thr, iou, 0.0)
    n_g, n_p = len(gb), len(pb)
    best_total, best = -1.0, []
    idx_small = range(min(n_g, n_p))
    if n_g <= n_p:
        for perm in itertools.permutations(range(n_p), n_g):
            tot = sum(gain[i, perm[i]] for i in idx_small)
            if tot > best_total:
                best_total = tot
                best = [(i, perm[i], iou[i, perm[i]]) for i in idx_small
                        if iou[i, perm[i]] > thr]
    else:
        for perm in itertools.permutations(range(n_g), n_p):
            tot = sum(gain[perm[j], j] for j in idx_small)
            if tot > best_total:
                best_total = tot
                best = [(perm[j], j, iou[perm[j], j]) for j in idx_small
                        if iou[perm[j], j] > thr]
    return best


def brute_waymo(gt_annos, pred_annos, class_names):
    thr_map = {'Vehicle': 0.7, 'Car': 0.7, 'Pedestrian': 0.5,
               'Cyclist': 0.5, 'Sign': 0.5}
    out = {}
    for cls in class_names:
        thr = thr_map.get(cls, 0.5)
        for level in (1, 2):
            recs = []
            n_gt = 0
            for g, p in zip(gt_annos, pred_annos):
                gm = np.asarray(g['name']) == cls
                gb = np.asarray(g['boxes_3d'], np.float64)[gm]
                npts = np.asarray(g['num_points_in_gt'])[gm] \
                    if 'num_points_in_gt' in g else np.full(gm.sum(), 6)
                in_level = npts > 5 if level == 1 else npts >= 1
                n_gt += int(in_level.sum())
                pm = np.asarray(p['name']) == cls
                pb = np.asarray(p['boxes_3d'], np.float64)[pm]
                ps = np.asarray(p['score'])[pm]
                matches = brute_match(gb, pb, thr)
                used = set()
                for (i, j, _iou) in matches:
                    used.add(j)
                    if in_level[i]:
                        ha = 1 - abs(_wrap(pb[j, 6] - gb[i, 6])) / np.pi
                        recs.append((float(ps[j]), 1, ha))
                for j in range(len(pb)):
                    if j not in used:
                        recs.append((float(ps[j]), 0, 0.0))
            key = f'{cls}_L{level}'
            if n_gt == 0 or not recs:
                out[f'{key}_AP'] = 0.0
                out[f'{key}_APH'] = 0.0
                continue
            recs.sort(key=lambda r: -r[0])
            ap = aph = 0.0
            for rr in np.linspace(0, 1, 101):
                # max precision over operating points with recall >= rr
                best_p = best_ph = 0.0
                tp = tph = fp = 0
                for (s, is_tp, ha) in recs:
                    tp += is_tp
                    tph += is_tp * ha
                    fp += 1 - is_tp
                    if tp / n_gt >= rr:
                        best_p = max(best_p, tp / (tp + fp))
                        best_ph = max(best_ph, tph / (tp + fp))
                ap += best_p / 101
                aph += best_ph / 101
            out[f'{key}_AP'] = ap
            out[f'{key}_APH'] = aph
    return out


def rand_scene_waymo(rng, n_frames=2):
    classes = ['Vehicle', 'Pedestrian']
    gt, pred = [], []
    for _ in range(n_frames):
        ng, npr = rng.randint(0, 5), rng.randint(0, 6)
        gb = np.stack([_rand_box(rng) for _ in range(ng)]) \
            if ng else np.zeros((0, 7))
        pb = []
        for _ in range(npr):
            if ng and rng.rand() < 0.7:      # perturb a gt -> borderline IoU
                b = gb[rng.randint(ng)].copy()
                b[:2] += rng.randn(2) * 0.4
                b[6] += rng.randn() * 0.4
                pb.append(b)
            else:
                pb.append(_rand_box(rng))
        pb = np.stack(pb) if npr else np.zeros((0, 7))
        gt.append({'name': rng.choice(classes, ng),
                   'boxes_3d': gb,
                   'num_points_in_gt': rng.randint(0, 20, ng)})
        pred.append({'name': rng.choice(classes, npr), 'boxes_3d': pb,
                     'score': rng.rand(npr)})
    return gt, pred


def _rand_box(rng):
    return np.array([rng.uniform(0, 40), rng.uniform(-20, 20),
                     rng.uniform(-2, 0), rng.uniform(1.5, 5),
                     rng.uniform(1, 2.5), rng.uniform(1, 2),
                     rng.uniform(-np.pi, np.pi)], np.float64)


def test_waymo_fuzz_200(rng):
    for t in range(200):
        gt, pred = rand_scene_waymo(rng)
        _s, got = evaluate_waymo(gt, pred, ['Vehicle', 'Pedestrian'])
        want = brute_waymo(gt, pred, ['Vehicle', 'Pedestrian'])
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-9, (t, k, got[k], v)


# ---------------- brute-force nuScenes ----------------

def brute_nuscenes(gt_annos, pred_annos, class_names):
    out = {}
    ap_all = []
    tp_keys = ['trans', 'scale', 'orient']
    tp_all = {k: [] for k in tp_keys}
    for cls in class_names:
        flat_preds = []      # (score, sample, box)
        gts = []
        for s, (g, p) in enumerate(zip(gt_annos, pred_annos)):
            for i in range(len(g['name'])):
                if g['name'][i] == cls:
                    gts.append((s, np.asarray(g['boxes_3d'][i])))
            for i in range(len(p['name'])):
                if p['name'][i] == cls:
                    flat_preds.append((float(p['score'][i]), s,
                                       np.asarray(p['boxes_3d'][i])))
        n_gt = len(gts)
        flat_preds = sorted(enumerate(flat_preds),
                            key=lambda kv: -kv[1][0])
        aps = []
        for th in DIST_THRESHOLDS:
            taken = set()
            rows = []        # (tp?, errs)
            for _orig, (score, s, box) in flat_preds:
                best_gi, best_d = -1, th
                for gi, (gs, gb) in enumerate(gts):
                    if gs != s or gi in taken:
                        continue
                    d = np.sqrt((box[0] - gb[0]) ** 2 + (box[1] - gb[1]) ** 2)
                    if d < best_d:
                        best_gi, best_d = gi, d
                if best_gi >= 0:
                    taken.add(best_gi)
                    gb = gts[best_gi][1]
                    rows.append((True, {'trans': best_d,
                                        'scale': 1 - _aligned_iou3d(gb, box),
                                        'orient': _yaw_diff(box[6], gb[6])}))
                else:
                    rows.append((False, None))
            # AP: manual linear interpolation of the PR curve
            if n_gt == 0 or not rows:
                aps.append(0.0)
                if th == TP_THRESHOLD:
                    for k in tp_keys:
                        out[f'{cls}_{k}_err'] = 1.0
                continue
            rec, prec = [], []
            tp = fp = 0
            for (is_tp, _e) in rows:
                tp += is_tp
                fp += not is_tp
                rec.append(tp / n_gt)
                prec.append(tp / (tp + fp))
            prec_i = np.interp(np.linspace(0, 1, N_INTERP), rec, prec,
                               right=0)
            lo = int(round(100 * MIN_RECALL)) + 1
            ap = np.mean(np.clip(prec_i[lo:] - MIN_PRECISION, 0, None)) \
                / (1 - MIN_PRECISION)
            aps.append(float(ap))
            if th == TP_THRESHOLD:
                errs = [e for (is_tp, e) in rows if is_tp]
                for k in tp_keys:
                    if n_gt == 0 or not errs:
                        out[f'{cls}_{k}_err'] = 1.0
                        continue
                    vals = np.asarray([e[k] for e in errs])
                    cm = np.cumsum(vals) / np.arange(1, len(vals) + 1)
                    rc = np.arange(1, len(vals) + 1) / n_gt
                    ei = np.interp(np.linspace(0, 1, N_INTERP), rc, cm,
                                   right=cm[-1])
                    hi = int(round(100 * min(rc.max(), 1.0))) + 1
                    out[f'{cls}_{k}_err'] = 1.0 if hi <= lo else \
                        float(np.mean(ei[lo:hi]))
        out[f'{cls}_AP'] = float(np.mean(aps))
        ap_all.append(out[f'{cls}_AP'])
        for k in tp_keys:
            tp_all[k].append(out[f'{cls}_{k}_err'])
    out['mAP'] = float(np.mean(ap_all)) if ap_all else 0.0
    tp_scores = []
    for k in tp_keys:
        m = float(np.mean(tp_all[k])) if tp_all[k] else 1.0
        out[f'm{k.upper()}E'] = m
        tp_scores.append(max(0.0, 1 - min(1.0, m)))
    out['NDS'] = (5 * out['mAP'] + sum(tp_scores)) / (5 + len(tp_scores))
    return out


def rand_scene_nusc(rng, n_frames=2):
    classes = ['car', 'pedestrian']
    gt, pred = [], []
    for _ in range(n_frames):
        ng, npr = rng.randint(0, 5), rng.randint(0, 7)
        gb = np.stack([_rand_box(rng) for _ in range(ng)]) \
            if ng else np.zeros((0, 7))
        pb = []
        for _ in range(npr):
            if ng and rng.rand() < 0.7:
                b = gb[rng.randint(ng)].copy()
                b[:2] += rng.randn(2) * 1.2   # perturb around the thresholds
                b[3:6] *= rng.uniform(0.7, 1.3, 3)
                b[6] += rng.randn()
                pb.append(b)
            else:
                pb.append(_rand_box(rng))
        pb = np.stack(pb) if npr else np.zeros((0, 7))
        gt.append({'name': rng.choice(classes, ng), 'boxes_3d': gb})
        pred.append({'name': rng.choice(classes, npr), 'boxes_3d': pb,
                     'score': rng.rand(npr)})
    return gt, pred


def test_nuscenes_fuzz_200(rng):
    for t in range(200):
        gt, pred = rand_scene_nusc(rng)
        _s, got = evaluate_nuscenes(gt, pred, ['car', 'pedestrian'])
        want = brute_nuscenes(gt, pred, ['car', 'pedestrian'])
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-9, (t, k, got[k], v)
