"""DetectorProgram.warm(): pre-compiling program variants.

The warm contract (the TPU analog of the reference's TensorRT engine
pre-build, tools/convert_yolox_to_tensorrt.py): after warm(batch, hw[, k])
a real dispatch at the same shape performs ZERO additional compilations —
and warm must keep working as program signatures evolve (a stale
hand-built call in tools/warm_compile_cache.py broke exactly this when the
fused gates grew a gate_lanes argument).
"""
import numpy as np
import pytest

from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram, FilterSettings, ProgramSpec)

HW = (64, 64)


def _program(**kw):
    spec = ProgramSpec(detector_type="yolox", variant="yolox-nano",
                       input_hw=HW, max_det=16, **kw)
    prog = DetectorProgram(spec, seed=0)
    prog.update_filters(FilterSettings(conf_threshold=0.0,
                                       wildlife_only=False))
    return prog


def _frames(batch, rng_seed=0):
    rng = np.random.default_rng(rng_seed)
    return rng.integers(0, 256, (batch, *HW, 3), np.uint8)


@pytest.mark.parametrize("gates", ["none", "device"])
def test_warm_plain_then_dispatch_no_recompile(gates):
    kw = dict(gates=gates, gate_lanes=3, gate_blur_size=5,
              gate_motion_blur_size=5) if gates == "device" else {}
    prog = _program(**kw)
    prog.warm(2, HW)
    warmed = prog.stats["compilations"]
    assert warmed >= 1
    lanes = [0, 1] if gates == "device" else None
    rows = prog.detect_batch_rows(_frames(2), lanes=lanes)
    assert rows.shape == (2, 16, 7)
    assert prog.stats["compilations"] == warmed


@pytest.mark.slow  # compiles 2 full delta program variants (~15s each)
@pytest.mark.parametrize("gates", ["none", "device"])
def test_warm_delta_k_bucket_then_dispatch_no_recompile(gates):
    kw = dict(transfer="delta", delta_lanes=3, delta_refresh_tiles=4)
    if gates == "device":
        kw.update(gates="device", gate_lanes=3, gate_blur_size=5,
                  gate_motion_blur_size=5)
    prog = _program(**kw)
    num_tiles = (HW[0] // prog.spec.delta_tile) * (HW[1] // prog.spec.delta_tile)
    # first dispatch of a fresh delta stream ships the FULL refresh
    prog.warm(2, HW, k=num_tiles)
    warmed = prog.stats["compilations"]
    rows = prog.detect_batch_rows(_frames(2), lanes=[0, 1])
    assert rows.shape == (2, 16, 7)
    assert prog.stats["compilations"] == warmed
    # warming must not have corrupted the delta mirrors: a second dispatch
    # of identical frames ships ~0 changed tiles yet detects identically
    rows2 = prog.detect_batch_rows(_frames(2), lanes=[0, 1])
    np.testing.assert_allclose(rows, rows2, atol=1e-4)


def test_warm_rejects_k_for_non_delta():
    prog = _program()
    with pytest.raises(ValueError):
        prog.warm(2, HW, k=4)
