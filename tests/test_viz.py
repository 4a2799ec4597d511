"""Viewer3D graph layers, HTML map export, plot drawer timing curves."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def small_slam():
    from pyslam_tpu.features.tracker import FeatureTrackerConfig
    from pyslam_tpu.io.dataset import SyntheticDataset
    from pyslam_tpu.io.dataset_types import SensorType
    from pyslam_tpu.slam.camera import PinholeCamera
    from pyslam_tpu.slam.slam import Slam

    ds = SyntheticDataset(num_frames=10, sensor_type=SensorType.STEREO,
                          trajectory="line", step=0.4)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                        fps=ds.fps, bf=ds.fx * ds.baseline,
                        depth_threshold=20.0)
    slam = Slam(cam, FeatureTrackerConfig(num_features=400, num_levels=4),
                sensor_type=SensorType.STEREO)
    for i in range(8):
        slam.track(ds.getImage(i), img_right=ds.getImageRight(i),
                   frame_id=i, timestamp=ds.getTimestamp(i))
    return slam


def test_graph_edges(small_slam):
    from pyslam_tpu.viz.viewer3d import Viewer3D

    cov, span, loops = Viewer3D._graph_edges(small_slam, covis_min_weight=1)
    assert len(span) >= 1          # spanning tree connects the keyframes
    assert len(cov) >= 1
    for p, q in span:
        assert p.shape == (3,) and q.shape == (3,)


def test_html_export(small_slam, tmp_path):
    from pyslam_tpu.viz.viewer3d import Viewer3D

    out = str(tmp_path / "map.html")
    v = Viewer3D(backend="matplotlib", out_path=str(tmp_path / "m.png"))
    v.export_html(small_slam, out)
    html = open(out).read()
    assert "pyslam_tpu map" in html
    assert '"points":' in html and '"kf_poses":' in html
    assert "frustumSegs" in html           # inline renderer present
    assert len(html) > 5000


def test_matplotlib_snapshot(small_slam, tmp_path):
    from pyslam_tpu.viz.viewer3d import Viewer3D

    out = str(tmp_path / "m.png")
    v = Viewer3D(backend="matplotlib", out_path=out)
    v.draw_map(small_slam)
    assert os.path.getsize(out) > 1000


def test_plot_drawer_timings(small_slam, tmp_path):
    from pyslam_tpu.viz.viewer3d import SlamPlotDrawer

    out = str(tmp_path / "plots.png")
    d = SlamPlotDrawer(out_path=out)
    for i in range(5):
        d.add(i, 100 + i, 80 + i, fps=10.0, timings=small_slam.timings())
    d.save()
    assert os.path.getsize(out) > 1000
    assert any(k.startswith("tracking.") for k in d.timing_curves)
