"""Hungarian matcher: exact-optimality vs scipy, jit/vmap/grad-context use.

The matcher is the correctness keystone of RT-DETR training (every decoder
layer's targets come from it), so it is pinned against
scipy.optimize.linear_sum_assignment — same total cost on every instance,
including ties and rectangular shapes.
"""
import numpy as np
import pytest

from scipy.optimize import linear_sum_assignment

from telescope_cam_detection_tpu.train.matcher import hungarian_match


def _check(c):
    rows, cols = linear_sum_assignment(c)
    ours = np.asarray(hungarian_match(c))
    n = c.shape[0]
    assert sorted(set(ours.tolist())) == sorted(ours.tolist()), "cols reused"
    ref = c[rows, cols].sum()
    got = c[np.arange(n), ours].sum()
    assert got == pytest.approx(ref, abs=1e-4), (ref, got)


def test_matches_scipy_random():
    rng = np.random.default_rng(0)
    # one shape -> one compile on the 1-core CI host
    for _ in range(20):
        _check(rng.normal(size=(12, 40)).astype(np.float32))


def test_matches_scipy_with_ties():
    rng = np.random.default_rng(1)
    for _ in range(10):
        _check(np.round(rng.normal(size=(12, 40))).astype(np.float32) * 2.0)


def test_square_and_single_row():
    rng = np.random.default_rng(2)
    _check(rng.normal(size=(8, 8)).astype(np.float32))
    _check(rng.normal(size=(1, 5)).astype(np.float32))


def test_batched_matches_scipy():
    rng = np.random.default_rng(3)
    c = rng.normal(size=(4, 10, 30)).astype(np.float32)
    out = np.asarray(hungarian_match(c))
    assert out.shape == (4, 10)
    for b in range(4):
        rows, cols = linear_sum_assignment(c[b])
        assert c[b][np.arange(10), out[b]].sum() == pytest.approx(
            c[b][rows, cols].sum(), abs=1e-4)


def test_constant_padding_rows_do_not_disturb_valid_rows():
    # padded GT rows get constant cost (detr_loss._matching_cost); the
    # valid rows must still receive an optimal assignment among themselves
    rng = np.random.default_rng(4)
    valid = rng.normal(size=(5, 25)).astype(np.float32)
    padded = np.concatenate([valid, np.zeros((7, 25), np.float32)], axis=0)
    ours = np.asarray(hungarian_match(padded))[:5]
    rows, cols = linear_sum_assignment(valid)
    assert valid[np.arange(5), ours].sum() == pytest.approx(
        valid[rows, cols].sum(), abs=1e-4)
