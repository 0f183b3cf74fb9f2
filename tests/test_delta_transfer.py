"""Tile-delta transfer: host encoder + device reconstruction + program mode.

The delta path replaces full-frame H2D transfers with changed-tile scatters
against a device-resident reference (ops/delta.py, runtime/delta.py). These
tests pin: exact reconstruction, multi-lane and chained same-lane semantics,
the encoder's bounded-error/refresh contract, and end-to-end equivalence with
the plain host-resize transfer mode.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from telescope_cam_detection_tpu.ops.delta import (
    apply_tile_deltas,
    tiled_shape,
    untile,
)
from telescope_cam_detection_tpu.runtime.delta import DeltaEncoder, pack_batch
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram,
    FilterSettings,
    ProgramSpec,
)
from telescope_cam_detection_tpu.utils.frames import SyntheticFrameSource


def _tile_up(frame: np.ndarray, t: int) -> np.ndarray:
    h, w, c = frame.shape
    return (frame.reshape(h // t, t, w // t, t, c)
            .transpose(0, 2, 1, 3, 4).reshape(-1, t, t, c))


def test_apply_tile_deltas_full_refresh_roundtrip():
    rng = np.random.default_rng(0)
    hw, t = (32, 48), 16
    frame = rng.integers(0, 256, (*hw, 3), np.uint8)
    ref = jnp.zeros(tiled_shape(hw, t, lanes=2), jnp.uint8)
    tiles = _tile_up(frame, t)
    idx = np.arange(tiles.shape[0], dtype=np.int32)
    new_ref, frames = apply_tile_deltas(
        ref, jnp.asarray([1], jnp.int32), jnp.asarray(idx[None]),
        jnp.asarray(tiles[None]), hw)
    np.testing.assert_array_equal(np.asarray(frames)[0], frame)
    # lane 0 untouched, lane 1 holds the frame
    assert np.asarray(new_ref)[0].max() == 0
    np.testing.assert_array_equal(
        np.asarray(untile(new_ref[1:2], hw))[0], frame)


def test_apply_tile_deltas_pad_dropped_and_chained():
    """Pad index T is dropped; same-lane entries chain within a batch."""
    hw, t = (32, 32), 16
    T = 4
    ref = jnp.zeros(tiled_shape(hw, t, lanes=1), jnp.uint8)
    # entry 0: set tile 0 to 10s (padded with T); entry 1: set tile 3 to 20s
    idx = np.array([[0, T], [3, T]], np.int32)
    tiles = np.zeros((2, 2, t, t, 3), np.uint8)
    tiles[0, 0] = 10
    tiles[1, 0] = 20
    lanes = jnp.zeros((2,), jnp.int32)
    new_ref, frames = apply_tile_deltas(
        ref, lanes, jnp.asarray(idx), jnp.asarray(tiles), hw)
    f0, f1 = np.asarray(frames)
    assert f0[0, 0, 0] == 10 and f0[16, 16, 0] == 0
    # frame 1 sees BOTH its own delta and entry 0's (chained state)
    assert f1[0, 0, 0] == 10 and f1[16, 16, 0] == 20
    r = np.asarray(untile(new_ref, hw))[0]
    assert r[0, 0, 0] == 10 and r[16, 16, 0] == 20


def test_encoder_first_frame_is_full_refresh_then_sparse():
    src = SyntheticFrameSource(width=256, height=256, seed=0, noise_sigma=0)
    enc = DeltaEncoder((256, 256), tile=16, threshold=4, refresh_tiles=0)
    idx0, _ = enc.encode(src.frame_at(0))
    assert len(idx0) == enc.num_tiles  # zeros mirror -> everything changed
    idx1, _ = enc.encode(src.frame_at(1))
    # only the moving blob's tiles change on a noise-free static background
    assert 0 < len(idx1) < enc.num_tiles // 4


def test_encoder_bounded_error_and_mirror_consistency():
    rng = np.random.default_rng(1)
    enc = DeltaEncoder((32, 32), tile=16, threshold=10, refresh_tiles=0)
    base = rng.integers(0, 256, (32, 32, 3), np.uint8)
    enc.encode(base)
    # small perturbation below threshold: nothing sent, mirror error bounded
    wiggle = np.clip(base.astype(np.int16) +
                     rng.integers(-9, 10, base.shape), 0, 255).astype(np.uint8)
    idx, _ = enc.encode(wiggle)
    assert len(idx) == 0
    assert np.abs(enc.ref.astype(int) - wiggle.astype(int)).max() <= 10
    # large change in one tile: exactly that tile is sent, mirror exact there
    poked = wiggle.copy()
    poked[20, 20] = 255
    idx, tiles = enc.encode(poked)
    assert list(idx) == [3]  # tile (1,1) of the 2x2 grid
    np.testing.assert_array_equal(enc.ref[16:, 16:], poked[16:, 16:])


def test_encoder_rolling_refresh_covers_all_tiles():
    enc = DeltaEncoder((64, 64), tile=16, threshold=255, refresh_tiles=4)
    frame = np.full((64, 64, 3), 7, np.uint8)
    sent = set()
    for _ in range(4):  # 16 tiles / 4 per frame
        idx, _ = enc.encode(frame)
        sent.update(int(i) for i in idx)
    assert sent == set(range(enc.num_tiles))
    np.testing.assert_array_equal(enc.ref, frame)


def test_pack_batch_buckets_and_padding():
    t = 16
    enc0 = (np.array([1, 5], np.int32), np.ones((2, t, t, 3), np.uint8))
    enc1 = (np.zeros((0,), np.int32), np.zeros((0, t, t, 3), np.uint8))
    lanes, idx, tiles, k = pack_batch([enc0, enc1], [0, 1], num_tiles=100,
                                      tile=t, k_buckets=(4, 8))
    assert k == 4 and idx.shape == (2, 4) and tiles.shape == (2, 4, t, t, 3)
    assert list(idx[0]) == [1, 5, 100, 100]  # padded with num_tiles
    assert list(idx[1]) == [100] * 4
    # spill above the largest bucket -> all tiles
    big = (np.arange(9, dtype=np.int32), np.zeros((9, t, t, 3), np.uint8))
    _, _, _, k = pack_batch([big], [0], num_tiles=100, tile=t, k_buckets=(4, 8))
    assert k == 100


def _mini_spec(**kw):
    return ProgramSpec(variant="yolox-nano", input_hw=(128, 128), max_det=8,
                       pre_nms_topk=32, **kw)


@pytest.mark.slow
def test_program_delta_matches_host_transfer():
    """threshold=0 sends every changed pixel's tile -> reconstruction is
    exact, so delta rows must match the plain host-resize transfer rows."""
    frames = np.stack([SyntheticFrameSource(width=256, height=192, seed=0)
                       .frame_at(i) for i in range(3)])
    filt = FilterSettings(conf_threshold=0.0, wildlife_only=False)

    ref_prog = DetectorProgram(_mini_spec(transfer="host"), seed=0)
    ref_prog.update_filters(filt)
    want = ref_prog.detect_batch_rows(frames)

    delta_prog = DetectorProgram(
        _mini_spec(transfer="delta", delta_threshold=0, delta_refresh_tiles=0,
                   delta_lanes=2, delta_payload="rgb"), seed=0)
    delta_prog.update_filters(filt)
    got = delta_prog.detect_batch_rows(frames, lanes=[0, 0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    # second dispatch re-uses the device reference (sparse deltas now)
    frames2 = np.stack([SyntheticFrameSource(width=256, height=192, seed=0)
                        .frame_at(i) for i in range(3, 6)])
    want2 = ref_prog.detect_batch_rows(frames2)
    got2 = delta_prog.detect_batch_rows(frames2, lanes=[0, 0, 0])
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-3)
    assert delta_prog.stats["delta_tiles_sent"] > 0


@pytest.mark.slow
def test_program_delta_multilane_independent_streams():
    """Two lanes with different content stay independent."""
    src_a = SyntheticFrameSource(width=128, height=128, seed=0, noise_sigma=0)
    src_b = SyntheticFrameSource(width=128, height=128, seed=7, noise_sigma=0)
    prog = DetectorProgram(
        _mini_spec(transfer="delta", delta_threshold=4, delta_lanes=2,
                   delta_payload="rgb"), seed=0)
    prog.update_filters(FilterSettings(conf_threshold=0.0,
                                       wildlife_only=False))
    host = DetectorProgram(_mini_spec(transfer="host"), seed=0)
    host.update_filters(FilterSettings(conf_threshold=0.0,
                                       wildlife_only=False))
    for step in range(3):
        fa, fb = src_a.frame_at(step), src_b.frame_at(step)
        rows = prog.detect_batch_rows(np.stack([fa, fb]), lanes=[0, 1])
        want = host.detect_batch_rows(np.stack([fa, fb]))
        # threshold=4 on noise-free sources -> tiles either exact or unsent
        # with |err|<=4; scores may move a little
        valid_got = (rows[..., 5] >= 0).sum()
        valid_want = (want[..., 5] >= 0).sum()
        assert abs(int(valid_got) - int(valid_want)) <= 2


def test_program_delta_rejects_bad_lanes():
    prog = DetectorProgram(
        _mini_spec(transfer="delta", delta_lanes=2), seed=0)
    frames = np.zeros((1, 128, 128, 3), np.uint8)
    with pytest.raises(ValueError):
        prog.detect_batch_rows(frames, lanes=[5])
    with pytest.raises(ValueError):
        prog.detect_batch_rows(frames, lanes=[0, 1])


def test_native_encoder_bit_identical_to_numpy():
    """The C++ delta encoder (native/frameio.cpp frameio_delta_encode) must
    produce exactly the numpy path's indices, payloads, mirror state, and
    refresh-cursor evolution (including wrap-around)."""
    from telescope_cam_detection_tpu.utils import native
    import telescope_cam_detection_tpu.utils.native as nmod
    if not native.available() or nmod.delta_encode(
            np.zeros((16, 16, 3), np.uint8), np.zeros((16, 16, 3), np.uint8),
            16, 14, 0, 0) is None:
        pytest.skip("native delta encoder unavailable")
    src = SyntheticFrameSource(width=128, height=96, seed=2)
    a = DeltaEncoder((96, 128), tile=16, threshold=10, refresh_tiles=5)
    b = DeltaEncoder((96, 128), tile=16, threshold=10, refresh_tiles=5)
    orig = nmod.delta_encode
    try:
        # enough frames that the refresh cursor wraps (48 tiles / 5 per frame)
        for i in range(25):
            f = src.frame_at(i)
            ia, ta = a.encode(f)
            nmod.delta_encode = lambda *args, **kw: None  # force numpy
            ib, tb = b.encode(f)
            nmod.delta_encode = orig
            np.testing.assert_array_equal(ia, ib)
            np.testing.assert_array_equal(ta, tb)
            np.testing.assert_array_equal(a.ref, b.ref)
            assert a._refresh_cursor == b._refresh_cursor
    finally:
        nmod.delta_encode = orig


@pytest.mark.slow
def test_readback_compaction_keeps_all_valid_rows():
    """readback_topk compacts the device result to the K best rows: every
    valid detection survives when there are <= K, invalid padding is pushed
    out, order is score-descending; detections match the uncompacted run."""
    frames = np.stack([SyntheticFrameSource(width=256, height=192, seed=0)
                       .frame_at(i) for i in range(2)])
    filt = FilterSettings(conf_threshold=0.0, wildlife_only=False)
    full = DetectorProgram(_mini_spec(transfer="host"), seed=0)
    full.update_filters(filt)
    want = full.detect_batch_rows(frames)

    compact = DetectorProgram(_mini_spec(transfer="host", readback_topk=6),
                              seed=0)
    compact.update_filters(filt)
    got = compact.detect_batch_rows(frames)
    assert got.shape == (2, 6, 7)
    for b in range(2):
        w_valid = want[b][want[b][:, 5] >= 0]
        g_valid = got[b][got[b][:, 5] >= 0]
        w_scores = np.sort(w_valid[:, 4] * w_valid[:, 5])[::-1]
        g_scores = g_valid[:, 4] * g_valid[:, 5]
        # compaction returns score-descending, keeping the best min(K, n)
        assert (np.diff(g_scores) <= 1e-6).all()
        np.testing.assert_allclose(g_scores, w_scores[:len(g_scores)],
                                   rtol=1e-5)
        assert len(g_valid) == min(len(w_valid), 6)


@pytest.mark.slow
def test_yuv_payload_matches_yuv420_transfer_mode():
    """YUV delta payload (threshold=0: every changed tile ships) must match
    the full-frame yuv420 transfer mode — identical YUV bytes reach the
    device, so rows agree to float tolerance."""
    frames = np.stack([SyntheticFrameSource(width=256, height=192, seed=1)
                       .frame_at(i) for i in range(3)])
    filt = FilterSettings(conf_threshold=0.0, wildlife_only=False)

    yuv_prog = DetectorProgram(_mini_spec(transfer="yuv420"), seed=0)
    yuv_prog.update_filters(filt)
    want = yuv_prog.detect_batch_rows(frames)

    delta_prog = DetectorProgram(
        _mini_spec(transfer="delta", delta_threshold=0, delta_refresh_tiles=0,
                   delta_lanes=2, delta_payload="yuv420"), seed=0)
    delta_prog.update_filters(filt)
    got = delta_prog.detect_batch_rows(frames, lanes=[0, 0, 0])
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)

    # steady state: sparse yuv deltas, bounded error, rows stay close
    frames2 = np.stack([SyntheticFrameSource(width=256, height=192, seed=1)
                        .frame_at(i) for i in range(3, 6)])
    want2 = yuv_prog.detect_batch_rows(frames2)
    got2 = delta_prog.detect_batch_rows(frames2, lanes=[0, 0, 0])
    np.testing.assert_allclose(got2, want2, rtol=1e-4, atol=1e-3)


def test_yuv_payload_encoder_mirror_and_size():
    """YUV payload records are tile*tile*3//2 bytes (half of RGB) and the
    encoder mirror tracks the device reference exactly."""
    enc = DeltaEncoder((32, 32), tile=16, threshold=6, refresh_tiles=0,
                       payload="yuv420")
    frame = np.full((32, 32, 3), 90, np.uint8)
    idx, rows = enc.encode(frame)
    assert len(idx) == enc.num_tiles           # first frame: full refresh
    assert rows.shape == (4, 16 * 16 * 3 // 2)
    # tiny wiggle below threshold: nothing sent
    wiggle = frame.astype(np.int16) + 2
    idx2, rows2 = enc.encode(np.clip(wiggle, 0, 255).astype(np.uint8))
    assert len(idx2) == 0
    # big change in one tile: exactly that tile ships
    poked = frame.copy()
    poked[16:, 16:] = 200
    idx3, rows3 = enc.encode(poked)
    assert list(idx3) == [3]


def test_native_yuv_tiles_and_rows_match_numpy():
    """Native bgr_to_yuv_tiles / delta_encode_rows are bit-identical to the
    numpy fallbacks (same contract as the RGB encoder pair)."""
    from telescope_cam_detection_tpu.runtime.delta import bgr_to_yuv_tiles_numpy
    from telescope_cam_detection_tpu.utils import native
    rng = np.random.default_rng(0)
    frame = rng.integers(0, 256, (64, 96, 3), np.uint8)
    got = native.bgr_to_yuv_tiles(frame, 16)
    if got is None:
        pytest.skip("native yuv tiles unavailable")
    np.testing.assert_array_equal(got, bgr_to_yuv_tiles_numpy(frame, 16))

    data = rng.integers(0, 256, (24, 384), np.uint8)
    ref_native = rng.integers(0, 256, (24, 384), np.uint8)
    ref_numpy = ref_native.copy()
    out = native.delta_encode_rows(data, ref_native, 10, 2, 3)
    assert out is not None
    idx_n, rows_n = out
    diff = np.abs(data.astype(np.int16) - ref_numpy.astype(np.int16))
    changed = diff.max(axis=1) > 10
    changed[(np.arange(2, 5)) % 24] = True
    idx_p = np.flatnonzero(changed).astype(np.int32)
    rows_p = data[idx_p]
    ref_numpy[idx_p] = rows_p
    np.testing.assert_array_equal(idx_n, idx_p)
    np.testing.assert_array_equal(rows_n, rows_p)
    np.testing.assert_array_equal(ref_native, ref_numpy)


@pytest.mark.slow
def test_program_delta_pad_lane_entries():
    """lane -1 = batch padding: the program encodes the pad through a
    dedicated internal encoder lane (tiles must scatter somewhere) while
    the gate schedule never sees it; reconstruction stays exact for real
    entries across dispatches."""
    src = SyntheticFrameSource(width=256, height=192, seed=0)
    filt = FilterSettings(conf_threshold=0.0, wildlife_only=False)
    ref_prog = DetectorProgram(_mini_spec(transfer="host"), seed=0)
    ref_prog.update_filters(filt)
    prog = DetectorProgram(
        _mini_spec(transfer="delta", delta_threshold=0, delta_refresh_tiles=0,
                   delta_lanes=3, delta_payload="rgb"), seed=0)
    prog.update_filters(filt)
    for i in range(3):
        f = src.frame_at(i)
        frames = np.stack([f, np.zeros_like(f)])
        want = ref_prog.detect_batch_rows(frames)
        got = prog.detect_batch_rows(frames, lanes=[0, -1])
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)
    with pytest.raises(ValueError, match="lane out of range"):
        prog.detect_batch_rows(np.zeros((1, 192, 256, 3), np.uint8),
                               lanes=[-2])


@pytest.mark.slow
def test_program_delta_list_input_matches_ndarray_path():
    """Delta dispatch accepts a LIST of capture-res frames: the resize
    then runs inside the per-lane encode workers instead of serially
    before stacking. Same cv2 resize -> bit-identical rows AND identical
    delta mirror state vs the classic pre-resized ndarray path; pads may
    ride along already input-sized."""
    cv2 = pytest.importorskip("cv2")
    cap_wh, in_hw = (256, 192), (128, 128)
    frames_raw = [SyntheticFrameSource(width=cap_wh[0], height=cap_wh[1],
                                       seed=3).frame_at(i) for i in range(4)]
    pre = np.stack([cv2.resize(f, (in_hw[1], in_hw[0]),
                               interpolation=cv2.INTER_LINEAR)
                    for f in frames_raw])
    filt = FilterSettings(conf_threshold=0.0, wildlife_only=False)

    a = DetectorProgram(_mini_spec(transfer="delta", delta_threshold=4,
                                   delta_lanes=3), seed=0)
    a.update_filters(filt)
    b = DetectorProgram(_mini_spec(transfer="delta", delta_threshold=4,
                                   delta_lanes=3), seed=0)
    b.update_filters(filt)

    lanes = [0, 1, 0, 1]
    want = a.detect_batch_rows(pre, lanes=lanes)
    got = b.detect_batch_rows(frames_raw, lanes=lanes)
    # ndarray path resizes to input then reports boxes in input coords
    # (capture_hw unset); the list path infers capture_hw from the raw
    # frames, so rescale before comparing
    sy, sx = cap_wh[1] / in_hw[0], cap_wh[0] / in_hw[1]
    scaled = want.copy()
    valid = scaled[..., 5] >= 0
    scaled[..., 0] *= sx
    scaled[..., 1] *= sy
    scaled[..., 2] *= sx
    scaled[..., 3] *= sy
    np.testing.assert_allclose(got[valid][..., 4:], want[valid][..., 4:],
                               rtol=1e-4, atol=1e-3)
    np.testing.assert_allclose(got[valid][..., :4], scaled[valid][..., :4],
                               rtol=1e-4, atol=1e-2)

    # mirrors identical -> second dispatch ships the same tiles
    f2 = [SyntheticFrameSource(width=cap_wh[0], height=cap_wh[1],
                               seed=3).frame_at(i) for i in range(4, 8)]
    pre2 = np.stack([cv2.resize(f, (in_hw[1], in_hw[0]),
                                interpolation=cv2.INTER_LINEAR) for f in f2])
    a.detect_batch_rows(pre2, lanes=lanes)
    b.detect_batch_rows(f2, lanes=lanes)
    assert a.stats["delta_tiles_sent"] == b.stats["delta_tiles_sent"]

    # mixed shapes: input-sized pads skip the per-lane resize
    mixed = [frames_raw[0], np.zeros((*in_hw, 3), np.uint8)]
    rows = b.detect_batch_rows(mixed, lanes=[0, -1])
    assert rows.shape[0] == 2
