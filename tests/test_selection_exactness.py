"""Empirical bounds on the two-stage top-k approximation (VERDICT r1 item 7).

`two_stage_topk` can drop a candidate when two of the true top-k share a
length-`block` window. These tests measure that error on (a) CenterNet-like
peaked heatmaps produced by a trained-style gaussian mixture and (b) uniform
random scores, and pin the worst observed recall so regressions surface.
"""
import numpy as np
import jax
import jax.numpy as jnp

from pdm_ssd_tpu.ops.selection import two_stage_topk
from pdm_ssd_tpu.ops.centernet import topk_heatmap


def _centernet_like_heatmap(rng, C=3, H=200, W=176, n_peaks=24):
    """Gaussian peaks + low background noise, like a trained hm after sigmoid."""
    hm = rng.rand(C, H, W).astype(np.float32) * 0.02
    ys = rng.randint(4, H - 4, n_peaks)
    xs = rng.randint(4, W - 4, n_peaks)
    cs = rng.randint(0, C, n_peaks)
    amps = rng.uniform(0.3, 1.0, n_peaks)
    yy, xx = np.mgrid[0:H, 0:W]
    for y, x, c, a in zip(ys, xs, cs, amps):
        hm[c] = np.maximum(hm[c], a * np.exp(-((yy - y) ** 2 + (xx - x) ** 2) / 8.0))
    return hm


def _local_peaks(hm, thresh):
    """(C, H, W) -> flat indices of strict 3x3 local maxima above thresh."""
    C, H, W = hm.shape
    peaks = []
    for c in range(C):
        m = hm[c]
        for y in range(1, H - 1):
            for x in range(1, W - 1):
                v = m[y, x]
                if v > thresh and v == m[y - 1:y + 2, x - 1:x + 2].max() \
                        and (m[y - 1:y + 2, x - 1:x + 2] == v).sum() == 1:
                    peaks.append(c * H * W + y * W + x)
    return np.asarray(peaks)


def test_two_stage_topk_finds_every_local_peak():
    """The detection-relevant guarantee: the top-k candidates that matter are
    the distinct LOCAL MAXIMA (near-peak duplicates are NMS-redundant —
    plain exact-top-k "score recall" is the wrong metric on smooth heatmaps).
    Measured: top-1-per-block loses a weaker peak that shares a 16-cell block
    with a stronger one; the shipped top-2-per-block retains every peak here.
    """
    rng = np.random.RandomState(0)
    K = 100
    for trial in range(10):
        hm = _centernet_like_heatmap(rng)
        flat = jnp.asarray(hm.reshape(1, -1))
        appr_v, appr_i = two_stage_topk(flat, K)
        # indices must point at their reported values
        np.testing.assert_allclose(
            np.asarray(flat)[0, np.asarray(appr_i)[0]], np.asarray(appr_v)[0],
            rtol=0, atol=0)
        peaks = _local_peaks(hm, thresh=0.1)
        found = set(np.asarray(appr_i)[0].tolist())
        _ev, ei = jax.lax.top_k(flat, K)
        exact_found = set(np.asarray(ei)[0].tolist())
        # exact top-K itself drops weak peaks crowded out by strong-peak
        # neighborhoods (a property of the reference decode too); the
        # two-stage form must lose NO peak that exact top-K keeps
        missing = [p for p in peaks if p in exact_found and p not in found]
        assert not missing, f'lost {len(missing)} exact-kept local peaks'


def test_two_stage_topk_uniform_scores_bound():
    """Uniform scores are the adversarial case (ties spread everywhere)."""
    rng = np.random.RandomState(1)
    K = 100
    worst = 1.0
    for trial in range(10):
        x = jnp.asarray(rng.rand(1, 16384).astype(np.float32))
        exact_v, _ = jax.lax.top_k(x, K)
        appr_v, _ = two_stage_topk(x, K)
        recall = np.asarray(appr_v).sum() / np.asarray(exact_v).sum()
        worst = min(worst, recall)
    # with N/block = 1024 blocks >> K=100 the loss stays tiny even here
    assert worst >= 0.98, f'uniform-score recall {worst:.4f}'


def test_topk_heatmap_finds_every_local_peak():
    """The CenterHead decode path keeps every distinct object peak."""
    rng = np.random.RandomState(2)
    K = 50
    for trial in range(5):
        hm = _centernet_like_heatmap(rng, n_peaks=12)
        t = jnp.asarray(hm[None])                      # (1, C, H, W)
        scores, inds, classes, ys, xs = topk_heatmap(t, K)
        C, H, W = hm.shape
        flat_found = set((np.asarray(classes)[0] * H * W
                          + np.asarray(inds)[0]).tolist())
        peaks = _local_peaks(hm, thresh=0.1)
        flat = jnp.asarray(hm.reshape(1, -1))
        _ev, ei = jax.lax.top_k(flat, K)
        exact_found = set(np.asarray(ei)[0].tolist())
        missing = [p for p in peaks if p in exact_found
                   and p not in flat_found]
        assert not missing, f'lost {len(missing)} exact-kept local peaks'
