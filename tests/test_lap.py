"""Exact LAP solvers vs scipy Hungarian (VERDICT r2 item 3).

`np_lap` (host Jonker-Volgenant, the production path in TransFusion's
assigner) is fuzzed on random + tie-heavy + rectangular instances;
`auction_lap` (on-device) on small/square shapes where it is the designed
fit. Both must hit the scipy-optimal total cost, ties included.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from pdm_ssd_tpu.ops.lap import auction_lap, np_lap, np_lap_batch


def _total(cost, assign):
    rows = np.where(assign >= 0)[0]
    cols = assign[rows]
    assert len(set(cols.tolist())) == len(cols), 'items assigned twice'
    return cost[rows, cols].sum()


@pytest.mark.parametrize('shape', [(5, 5), (8, 20), (16, 16), (32, 200),
                                   (64, 200), (1, 7)])
def test_np_lap_matches_scipy(shape, rng):
    from scipy.optimize import linear_sum_assignment
    M, Q = shape
    for t in range(50):
        cost = rng.randn(M, Q).astype(np.float32) * 10
        a = np_lap(cost)
        assert (a >= 0).all()
        r, c = linear_sum_assignment(cost)
        np.testing.assert_allclose(_total(cost, a), cost[r, c].sum(),
                                   rtol=1e-9, atol=1e-6)


def test_np_lap_ties(rng):
    from scipy.optimize import linear_sum_assignment
    for t in range(100):
        cost = rng.randint(0, 4, size=(10, 14)).astype(np.float32)
        a = np_lap(cost)
        r, c = linear_sum_assignment(cost)
        assert _total(cost, a) == cost[r, c].sum()


def test_np_lap_batch_masks(rng):
    from scipy.optimize import linear_sum_assignment
    B, M, Q = 3, 6, 9
    cost = rng.randn(B, M, Q).astype(np.float32)
    mask = rng.rand(B, M) > 0.3
    mask[2] = False                       # fully-masked sample
    out = np_lap_batch(cost, mask)
    assert (out[~mask] == -1).all()
    for b in range(B):
        rows = np.where(mask[b])[0]
        if len(rows) == 0:
            continue
        r, c = linear_sum_assignment(cost[b][rows])
        np.testing.assert_allclose(cost[b][rows][r, c].sum(),
                                   cost[b][rows, out[b][rows]].sum(),
                                   rtol=1e-6)


def test_lap_callback_under_jit(rng):
    import jax
    from pdm_ssd_tpu.ops.lap import lap_callback
    from scipy.optimize import linear_sum_assignment
    cost = rng.randn(2, 5, 11).astype(np.float32)
    mask = np.ones((2, 5), bool)
    out = np.asarray(jax.jit(lap_callback)(jnp.asarray(cost),
                                           jnp.asarray(mask)))
    for b in range(2):
        r, c = linear_sum_assignment(cost[b])
        np.testing.assert_allclose(cost[b][r, c].sum(),
                                   cost[b][np.arange(5), out[b]].sum(),
                                   rtol=1e-6)


@pytest.mark.parametrize('shape', [(5, 5), (8, 20), (16, 16)])
def test_auction_matches_scipy(shape, rng):
    from scipy.optimize import linear_sum_assignment
    M, Q = shape
    for t in range(10):
        cost = rng.randn(M, Q).astype(np.float32) * 10
        assign = np.asarray(auction_lap(jnp.asarray(cost)))
        assert (assign >= 0).all()
        r, c = linear_sum_assignment(cost)
        got, want = _total(cost, assign), cost[r, c].sum()
        assert got <= want + 1e-3 * max(1.0, abs(want)), (t, got, want)


def test_auction_greedy_suboptimal_instance():
    """The canonical instance where greedy fails:
    greedy assigns (0,0)+(1,1)=1+10, optimal is (0,1)+(1,0)=2+2."""
    cost = np.array([[1.0, 2.0], [2.0, 10.0]], np.float32)
    assign = np.asarray(auction_lap(jnp.asarray(cost)))
    assert _total(cost, assign) == 4.0
    assert np_lap(cost).tolist() == [1, 0]


def test_auction_masks(rng):
    cost = rng.randn(6, 9).astype(np.float32)
    bm = np.array([1, 1, 0, 1, 0, 1], bool)
    im = np.ones(9, bool)
    im[[2, 5]] = False
    assign = np.asarray(auction_lap(jnp.asarray(cost), jnp.asarray(bm),
                                    jnp.asarray(im)))
    assert (assign[~bm] == -1).all()
    used = assign[bm]
    assert (used >= 0).all() and not np.isin(used, [2, 5]).any()
    from scipy.optimize import linear_sum_assignment
    sub = cost[np.ix_(np.where(bm)[0], np.where(im)[0])]
    r, c = linear_sum_assignment(sub)
    assert abs(cost[bm][np.arange(bm.sum()), assign[bm]].sum()
               - sub[r, c].sum()) < 1e-3
