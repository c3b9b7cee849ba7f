"""ONCE AP parity: our vectorized evaluator vs the reference implementation
(`pcdet/datasets/once/once_eval/evaluation.py`) on randomized annos.

The reference's numba kernels run as plain python through the ref_oracle
shim; its cuda rotated-IoU is monkeypatched to our host oracle on BOTH sides
so the test isolates the PROTOCOL (filtering, thresholds, matching, PR/AP).
"""
import numpy as np
import pytest

import ref_oracle
from pdm_ssd_tpu.datasets.once import once_eval as ours

CLASSES = ['Car', 'Bus', 'Truck', 'Pedestrian', 'Cyclist']


def _rand_annos(rng, n_samples=6, max_boxes=12):
    gts, preds = [], []
    for _ in range(n_samples):
        n = rng.randint(2, max_boxes)
        boxes = np.concatenate([
            rng.uniform(-60, 60, (n, 2)), rng.uniform(-2, 1, (n, 1)),
            rng.uniform(1.5, 5, (n, 2)), rng.uniform(1.2, 2.2, (n, 1)),
            rng.uniform(-np.pi, np.pi, (n, 1))], 1)
        names = np.asarray(CLASSES)[rng.randint(0, len(CLASSES), n)]
        gts.append({'name': names, 'boxes_3d': boxes})
        # predictions: jittered copies + a few false positives
        m = n + rng.randint(0, 4)
        pb = np.concatenate([boxes + rng.normal(0, 0.15, boxes.shape),
                             np.concatenate([
                                 rng.uniform(-60, 60, (m - n, 2)),
                                 rng.uniform(-2, 1, (m - n, 1)),
                                 rng.uniform(1.5, 5, (m - n, 2)),
                                 rng.uniform(1.2, 2.2, (m - n, 1)),
                                 rng.uniform(-np.pi, np.pi, (m - n, 1))], 1)])
        pn = np.concatenate([names, np.asarray(CLASSES)[
            rng.randint(0, len(CLASSES), m - n)]])
        preds.append({'name': pn, 'boxes_3d': pb,
                      'score': rng.rand(m).astype(np.float64)})
    return gts, preds


@pytest.mark.parametrize('use_superclass', [True, False])
def test_once_ap_matches_reference(use_superclass, monkeypatch):
    evaluation = ref_oracle.load('pcdet.datasets.once.once_eval.evaluation')
    # both sides use the same host rotated-IoU (isolates protocol logic)
    monkeypatch.setattr(evaluation, 'iou3d_kernel_with_heading',
                        ours.iou3d_with_heading)

    rng = np.random.RandomState(0)
    gts, preds = _rand_annos(rng)
    ref_str, ref_dict = evaluation.get_evaluation_results(
        [dict(g) for g in gts], [dict(p) for p in preds], list(CLASSES),
        use_superclass=use_superclass)
    our_str, our_dict = ours.get_evaluation_results(
        gts, preds, list(CLASSES), use_superclass=use_superclass)

    for k, v in ref_dict.items():
        assert k in our_dict, k
        np.testing.assert_allclose(our_dict[k], v, atol=1e-6, err_msg=k)
