"""Background host-prepare prefetch (`runtime/prefetch.py`) and the native
ladder-builder batch path / arena (`csrc.batch_build_ladder_maps`)."""
import numpy as np
import pytest

from pdm_ssd_tpu.runtime.prefetch import prefetch_batches


def test_prefetch_order_and_values():
    batches = [{'i': i} for i in range(7)]
    got = list(prefetch_batches(batches, lambda b: {'i': b['i'] * 10}))
    assert [b['i'] for b in got] == [i * 10 for i in range(7)]


def test_prefetch_passthrough_without_prepare():
    batches = [{'i': i} for i in range(3)]
    got = list(prefetch_batches(batches, None))
    assert got == batches      # identical objects, no thread involved
    assert got[0] is batches[0]


def test_prefetch_propagates_prepare_error():
    def bad(b):
        if b['i'] == 2:
            raise ValueError('boom')
        return b

    it = prefetch_batches(({'i': i} for i in range(5)), bad)
    assert next(it)['i'] == 0
    with pytest.raises(ValueError, match='boom'):
        list(it)


def test_prefetch_overlaps_slow_prepare():
    """The consumer's wall time covers prepare(i+1) running during
    consume(i): total ~= n*max(prep, consume), not n*(prep+consume)."""
    import time
    prep_s, consume_s, n = 0.03, 0.03, 8

    def prep(b):
        time.sleep(prep_s)
        return b

    t0 = time.perf_counter()
    for _ in prefetch_batches([{'i': i} for i in range(n)], prep):
        time.sleep(consume_s)
    elapsed = time.perf_counter() - t0
    serial = n * (prep_s + consume_s)
    assert elapsed < serial * 0.85, f'{elapsed:.3f}s vs serial {serial:.3f}s'


def test_batch_ladder_builder_matches_per_sample(rng):
    """csrc.batch_build_ladder_maps (np.empty outputs / arena path) equals
    the stacked per-sample builder."""
    from pdm_ssd_tpu import csrc
    if csrc.lib() is None:
        pytest.skip('no native toolchain')
    from pdm_ssd_tpu.ops import sparse_maps as sm
    dims_grid = (32, 24, 12)
    D, H, W = 13, 24, 32
    B, V = 3, 400
    coords = np.zeros((B, V, 3), np.int32)
    mask = np.zeros((B, V), bool)
    for b in range(B):
        n = 300 + 30 * b
        flat = rng.choice(D * H * W, n, replace=False)
        coords[b, :n] = np.stack(
            [flat // (H * W), (flat // W) % H, flat % W], -1)
        mask[b, :n] = True
    caps = [V, 900, 900, 600, 600]
    got = sm.batch_build_backbone8x(coords, mask, dims_grid, caps)
    per = [sm.build_backbone8x_maps(coords[b], int(mask[b].sum()),
                                    dims_grid, caps) for b in range(B)]
    ref = {k: np.stack([p[k] for p in per]) for k in sm.LADDER_KEYS}
    for k in sm.LADDER_KEYS:
        np.testing.assert_array_equal(np.asarray(ref[k], np.int64),
                                      np.asarray(got[k], np.int64),
                                      err_msg=k)


def test_ladder_arena_disabled_on_cpu_backend(rng):
    """On the CPU backend (the test env) the builder must NOT reuse output
    buffers across calls: the CPU PJRT client can zero-copy-alias numpy
    arrays into jax Arrays. Two consecutive builds must return distinct
    storage."""
    from pdm_ssd_tpu import csrc
    if csrc.lib() is None:
        pytest.skip('no native toolchain')
    import jax
    assert jax.default_backend() == 'cpu'
    dims0 = np.asarray([13, 24, 32], np.int32)
    coords = np.zeros((1, 64, 3), np.int32)
    coords[0, :, 2] = np.arange(64)
    mask = np.ones((1, 64), bool)
    caps = [64, 128, 128, 96, 96]
    a = csrc.batch_build_ladder_maps(coords, mask, dims0, caps)
    b = csrc.batch_build_ladder_maps(coords, mask, dims0, caps)
    c = csrc.batch_build_ladder_maps(coords, mask, dims0, caps)
    bases = {x['sp_submap1'].__array_interface__['data'][0]
             for x in (a, b, c)}
    assert len(bases) == 3
