"""Multi-chip inference: the fused detector program sharded over a Mesh
(cameras across devices), validated on the virtual 8-device CPU mesh."""
import numpy as np
import pytest

import jax

from telescope_cam_detection_tpu.parallel.mesh import create_mesh
from telescope_cam_detection_tpu.runtime.program import (
    DetectorProgram,
    FilterSettings,
    ProgramSpec,
)


@pytest.fixture(scope="module")
def sharded_and_single():
    spec = ProgramSpec(variant="yolox-nano", input_hw=(128, 128), max_det=8,
                       pre_nms_topk=40)
    mesh = create_mesh(8, model_parallel=1)
    sharded = DetectorProgram(spec, seed=0, mesh=mesh)
    single = DetectorProgram(spec, variables=sharded.variables)
    for p in (sharded, single):
        p.update_filters(FilterSettings(conf_threshold=0.0,
                                        wildlife_only=False))
    return sharded, single, mesh


@pytest.mark.slow
def test_sharded_matches_single_device(sharded_and_single):
    sharded, single, mesh = sharded_and_single
    frames = np.random.default_rng(0).integers(
        0, 256, (8, 128, 128, 3), np.uint8)  # one camera per device
    rows_sharded = sharded.detect_batch_rows(frames)
    rows_single = single.detect_batch_rows(frames)
    assert rows_sharded.shape == (8, 8, 7)
    np.testing.assert_allclose(rows_sharded, rows_single, rtol=1e-4,
                               atol=1e-3)


def test_sharded_output_actually_sharded(sharded_and_single):
    sharded, _, mesh = sharded_and_single
    frames = np.zeros((8, 128, 128, 3), np.uint8)
    rows = sharded.dispatch_batch(frames)
    shard_devices = {s.device for s in rows.addressable_shards}
    assert len(shard_devices) == 8  # batch axis spread over all devices


@pytest.mark.slow
def test_sharded_with_host_resize(sharded_and_single):
    sharded, single, _ = sharded_and_single
    frames = np.random.default_rng(1).integers(
        0, 256, (8, 256, 256, 3), np.uint8)  # triggers host resize
    rows = sharded.detect_batch_rows(frames)
    np.testing.assert_allclose(rows, single.detect_batch_rows(frames),
                               rtol=1e-4, atol=1e-3)
