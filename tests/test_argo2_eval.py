"""Argo2 CDS protocol eval (`pdm_ssd_tpu/datasets/argo2/argo2_eval.py`):
analytic cases + randomized equivalence fuzz against an independently
written naive oracle (different strategy: per-detection python loops with
explicit re-sorting, no vectorization, separate AP accumulation)."""
import numpy as np
import pytest

from pdm_ssd_tpu.datasets.argo2.argo2_eval import (
    AFFINITY_THRESHOLDS_M, MAX_SCALE_ERROR, MAX_YAW_ERROR, N_RECALL_SAMPLES,
    TP_THRESHOLD_M, evaluate_argo2)


# ---------------------------------------------------------------- oracle --
def _oracle_ap(records, n_gt):
    """records: list of (score, is_tp). Plain-python interpolated AP."""
    if n_gt == 0:
        return float('nan')
    if not records:
        return 0.0
    records = sorted(records, key=lambda r: -r[0])
    tps = 0
    prec, rec = [], []
    for k, (_, is_tp) in enumerate(records):
        tps += int(is_tp)
        prec.append(tps / (k + 1))
        rec.append(tps / n_gt)
    ap_sum = 0.0
    for r in np.linspace(0.0, 1.0, N_RECALL_SAMPLES):
        best = 0.0
        for p, rr in zip(prec, rec):
            if rr >= r - 1e-12 and p > best:
                best = p
        ap_sum += best
    return ap_sum / N_RECALL_SAMPLES


def _oracle(gt_annos, det_annos, class_names):
    out = {}
    for cls in class_names:
        n_gt = 0
        recs = {t: [] for t in AFFINITY_THRESHOLDS_M}
        errs = []
        for gt, det in zip(gt_annos, det_annos):
            g = [b for n, b in zip(gt['name'], np.asarray(gt['boxes_3d']))
                 if n == cls and np.linalg.norm(b[:3]) <= 150.0]
            d = [(s, b) for n, b, s in zip(det['name'],
                                           np.asarray(det['boxes_3d']),
                                           det['score'])
                 if n == cls and np.linalg.norm(b[:3]) <= 150.0]
            n_gt += len(g)
            for t in AFFINITY_THRESHOLDS_M:
                used = set()
                for s, b in sorted(d, key=lambda r: -r[0]):
                    cands = [(np.linalg.norm(b[:3] - gj[:3]), j)
                             for j, gj in enumerate(g) if j not in used]
                    cands = [c for c in cands if c[0] < t]
                    if cands:
                        dist, j = min(cands)
                        used.add(j)
                        recs[t].append((s, True))
                        if t == TP_THRESHOLD_M:
                            gj = g[j]
                            inter = 1.0
                            for a, bb in zip(b[3:6], gj[3:6]):
                                inter *= min(a, bb)
                            union = np.prod(b[3:6]) + np.prod(gj[3:6]) - inter
                            dy = abs(b[6] - gj[6]) % (2 * np.pi)
                            errs.append((min(dist, TP_THRESHOLD_M),
                                         min(1 - inter / union,
                                             MAX_SCALE_ERROR),
                                         min(min(dy, 2 * np.pi - dy),
                                             MAX_YAW_ERROR)))
                    else:
                        recs[t].append((s, False))
        aps = [_oracle_ap(recs[t], n_gt) for t in AFFINITY_THRESHOLDS_M]
        ap = float(np.mean(aps)) if n_gt else float('nan')
        if errs:
            ate, ase, aoe = (float(np.mean([e[i] for e in errs]))
                             for i in range(3))
        else:
            ate, ase, aoe = TP_THRESHOLD_M, MAX_SCALE_ERROR, MAX_YAW_ERROR
        cds = float('nan') if np.isnan(ap) else ap * np.mean(
            [1 - ate / TP_THRESHOLD_M, 1 - ase, 1 - aoe / MAX_YAW_ERROR])
        out[cls] = dict(AP=ap, ATE=ate, ASE=ase, AOE=aoe, CDS=cds)
    return out


def _random_frames(rng, n_frames=6, classes=('Car', 'Ped')):
    gts, dets = [], []
    for _ in range(n_frames):
        ng, nd = rng.integers(0, 8), rng.integers(0, 12)
        gb = np.concatenate([rng.uniform(-60, 60, (ng, 3)),
                             rng.uniform(0.5, 5, (ng, 3)),
                             rng.uniform(-np.pi, np.pi, (ng, 1))], -1)
        db = np.concatenate([rng.uniform(-60, 60, (nd, 3)),
                             rng.uniform(0.5, 5, (nd, 3)),
                             rng.uniform(-np.pi, np.pi, (nd, 1))], -1)
        # half the detections perturb a random gt (realistic near-matches)
        for i in range(nd // 2):
            if ng:
                j = rng.integers(ng)
                db[i] = gb[j] + np.concatenate(
                    [rng.normal(0, 1.2, 3), rng.normal(0, 0.3, 3),
                     rng.normal(0, 0.4, 1)])
        gts.append({'name': np.asarray(rng.choice(classes, ng), object),
                    'boxes_3d': gb})
        dets.append({'name': np.asarray(rng.choice(classes, nd), object),
                     'boxes_3d': db,
                     'score': rng.uniform(0, 1, nd)})
    return gts, dets


def test_perfect_detections():
    rng = np.random.default_rng(0)
    gts, _ = _random_frames(rng)
    dets = [{'name': g['name'], 'boxes_3d': g['boxes_3d'],
             'score': np.linspace(0.9, 0.5, len(g['name']))} for g in gts]
    _, res = evaluate_argo2(gts, dets, ['Car', 'Ped'])
    assert res['mAP'] == pytest.approx(1.0, abs=1e-6)
    assert res['mCDS'] == pytest.approx(1.0, abs=1e-6)
    assert res['Car/ATE'] == pytest.approx(0.0, abs=1e-9)


def test_translated_detections_known_errors():
    """A constant 1.5 m x-offset: matched at thresholds 2 and 4 only ->
    AP = mean(0, 0, 1, 1) = 0.5; ATE = 1.5; AOE = 0."""
    gt = [{'name': np.asarray(['Car'], object),
           'boxes_3d': np.asarray([[10.0, 0, 0, 4, 2, 1.5, 0.3]])}]
    det = [{'name': np.asarray(['Car'], object),
            'boxes_3d': np.asarray([[11.5, 0, 0, 4, 2, 1.5, 0.3]]),
            'score': np.asarray([0.9])}]
    _, res = evaluate_argo2(gt, det, ['Car'])
    assert res['Car/AP'] == pytest.approx(0.5, abs=1e-6)
    assert res['Car/ATE'] == pytest.approx(1.5, abs=1e-6)
    assert res['Car/AOE'] == pytest.approx(0.0, abs=1e-9)
    assert res['Car/ASE'] == pytest.approx(0.0, abs=1e-9)
    assert res['Car/CDS'] == pytest.approx(
        0.5 * np.mean([1 - 1.5 / 2.0, 1.0, 1.0]), abs=1e-6)


def test_no_tp_class_gets_max_errors():
    gt = [{'name': np.asarray(['Car'], object),
           'boxes_3d': np.asarray([[10.0, 0, 0, 4, 2, 1.5, 0.0]])}]
    det = [{'name': np.asarray(['Car'], object),
            'boxes_3d': np.asarray([[50.0, 40, 0, 4, 2, 1.5, 0.0]]),
            'score': np.asarray([0.9])}]
    _, res = evaluate_argo2(gt, det, ['Car'])
    assert res['Car/AP'] == 0.0
    assert res['Car/ATE'] == TP_THRESHOLD_M
    assert res['Car/CDS'] == 0.0


def test_range_filter():
    gt = [{'name': np.asarray(['Car', 'Car'], object),
           'boxes_3d': np.asarray([[10.0, 0, 0, 4, 2, 1.5, 0.0],
                                   [200.0, 0, 0, 4, 2, 1.5, 0.0]])}]
    det = [{'name': np.asarray(['Car'], object),
            'boxes_3d': np.asarray([[10.0, 0, 0, 4, 2, 1.5, 0.0]]),
            'score': np.asarray([0.9])}]
    _, res = evaluate_argo2(gt, det, ['Car'])
    assert res['Car/AP'] == pytest.approx(1.0, abs=1e-6)  # far gt dropped


def test_fuzz_vs_naive_oracle():
    rng = np.random.default_rng(7)
    for trial in range(40):
        gts, dets = _random_frames(rng, n_frames=int(rng.integers(1, 5)))
        _, res = _res = evaluate_argo2(gts, dets, ['Car', 'Ped'])
        ora = _oracle(gts, dets, ['Car', 'Ped'])
        for cls in ('Car', 'Ped'):
            for k in ('AP', 'ATE', 'ASE', 'AOE', 'CDS'):
                a, b = res[f'{cls}/{k}'], ora[cls][k]
                if np.isnan(b):
                    assert np.isnan(a), (trial, cls, k, a, b)
                else:
                    assert a == pytest.approx(b, abs=1e-9), (trial, cls, k)
