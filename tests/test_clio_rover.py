"""CLIO + ROVER dataset adapters (synthetic on-disk fixtures)."""

import os

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _write_png(path, arr):
    cv2.imwrite(path, arr)


def test_clio_dataset(tmp_path):
    from pyslam_tpu.io.dataset_factory import dataset_factory

    base = tmp_path / "scene"
    (base / "images").mkdir(parents=True)
    (base / "depth").mkdir()
    rng = np.random.default_rng(0)
    for i in (0, 1, 2, 5):    # non-contiguous ids like real bags
        img = rng.integers(0, 255, (48, 64, 3), dtype=np.uint8)
        _write_png(str(base / "images" / f"rgb_{i}.jpg"), img)
        depth = (rng.uniform(0.5, 4.0, (48, 64)) * 1000).astype(np.uint16)
        _write_png(str(base / "depth" / f"depth_{i}.png"), depth)

    ds = dataset_factory({"type": "clio", "base_path": str(base),
                          "sensor_type": "rgbd"})
    assert len(ds) == 4
    img = ds.getImage(0)
    assert img is not None and img.shape == (48, 64)
    d = ds.getDepth(3)           # id 5 -> depth_5.png
    assert d is not None and d.shape == (48, 64)
    assert 0.4 < np.median(d) < 4.2          # metres after depth_factor
    assert ds.getTimestamp(1) > ds.getTimestamp(0)


def test_rover_dataset(tmp_path):
    from pyslam_tpu.io.dataset_factory import dataset_factory

    cam = tmp_path / "seq1" / "cam0"
    (cam / "rgb").mkdir(parents=True)
    (cam / "depth").mkdir()
    rng = np.random.default_rng(1)
    lines = []
    for i in range(3):
        _write_png(str(cam / "rgb" / f"{i}.png"),
                   rng.integers(0, 255, (40, 50, 3), dtype=np.uint8))
        _write_png(str(cam / "depth" / f"{i}.png"),
                   (rng.uniform(1, 3, (40, 50)) * 1000).astype(np.uint16))
        lines.append(f"{100.0 + i * 0.1:.4f} rgb/{i}.png "
                     f"{100.0 + i * 0.1:.4f} depth/{i}.png")
    (cam / "associations.txt").write_text("\n".join(lines) + "\n")

    ds = dataset_factory({"type": "rover", "base_path": str(tmp_path),
                          "name": "seq1", "camera_name": "cam0",
                          "sensor_type": "rgbd"})
    assert len(ds) == 3
    assert ds.getImage(0).shape == (40, 50)
    assert ds.getDepth(2).shape == (40, 50)
    assert abs(ds.getTimestamp(1) - 100.1) < 1e-6
