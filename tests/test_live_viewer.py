"""Live HTTP viewer: state serving + loop-control surface.

The reference's pangolin Viewer3D exposes GUI controls the main loop consumes
(``viewer3D.py:711-722``, ``main_slam.py:449-478``); here the same surface is
served over localhost HTTP (``viz/live_viewer.py``).  These tests run a tiny
RGBD sequence, start the viewer on an ephemeral port, and drive it exactly
like a browser: GET the page + state.json, POST control commands, and assert
the main-loop-facing flags behave (pause blocks, step releases one iteration,
one-shot requests drain once, quit releases a paused loop).
"""

import json
import threading
import time
import urllib.request

import pytest

from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam
from pyslam_tpu.viz.live_viewer import LiveViewer3D


@pytest.fixture(scope="module")
def slam_with_map():
    ds = SyntheticDataset(
        num_frames=8, sensor_type=SensorType.RGBD, trajectory="line",
        step=0.3,
    )
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0,
    )
    slam = Slam(cam, FeatureTrackerConfig(num_features=300, num_levels=4),
                sensor_type=SensorType.RGBD)
    for i in range(len(ds)):
        slam.track(ds.getImage(i), depth=ds.getDepth(i), frame_id=i,
                   timestamp=ds.getTimestamp(i))
    slam.finish()
    assert slam.map.num_keyframes() >= 2
    return slam


@pytest.fixture()
def viewer():
    v = LiveViewer3D(port=0)   # ephemeral port
    yield v
    v.close()


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.status, r.read()


def _post(url, payload):
    req = urllib.request.Request(
        url, data=json.dumps(payload).encode(), method="POST")
    with urllib.request.urlopen(req, timeout=5) as r:
        return json.loads(r.read())


def test_serves_page_and_versioned_state(viewer, slam_with_map):
    status, body = _get(viewer.url + "/")
    assert status == 200 and b"pyslam_tpu live" in body

    # before any update: no scene yet
    st = json.loads(_get(viewer.url + "/state.json?v=-1")[1])
    assert st["scene"] is None and st["version"] == 0

    viewer.update(slam_with_map, status="frame 7", force=True)
    st = json.loads(_get(viewer.url + "/state.json?v=-1")[1])
    assert st["version"] == 1 and st["status"] == "frame 7"
    scene = st["scene"]
    assert scene["n_kfs"] >= 2
    assert len(scene["points"]) == len(scene["points"])
    assert len(scene["traj"]) >= 7
    assert len(scene["kf_poses"][0]) == 12          # 3x4 row-major

    # version-gated: same version -> scene omitted (bandwidth guard)
    st2 = json.loads(_get(viewer.url + f"/state.json?v={st['version']}")[1])
    assert st2["scene"] is None and st2["version"] == st["version"]


def test_update_throttling(viewer, slam_with_map):
    viewer.update(slam_with_map, force=True)
    v0 = viewer._version
    viewer.update(slam_with_map)            # within min interval -> no-op
    assert viewer._version == v0
    viewer.update(slam_with_map, force=True)
    assert viewer._version == v0 + 1


def test_pause_step_resume_protocol(viewer):
    assert not viewer.is_paused()
    assert _post(viewer.url + "/control", {"cmd": "pause"})["ok"]
    assert viewer.is_paused()

    # a paused loop blocks in wait_if_paused; 'step' releases exactly one
    # iteration and stays paused (reference single-step semantics)
    released = []

    def loop_iter():
        viewer.wait_if_paused(poll=0.01)
        released.append(time.monotonic())

    t = threading.Thread(target=loop_iter)
    t.start()
    time.sleep(0.15)
    assert not released, "loop must block while paused"
    _post(viewer.url + "/control", {"cmd": "step"})
    t.join(timeout=3.0)
    assert released and viewer.is_paused()

    _post(viewer.url + "/control", {"cmd": "resume"})
    assert not viewer.is_paused()
    viewer.wait_if_paused()                  # returns immediately now


def test_one_shot_requests_drain_once(viewer):
    for c in ("save", "gba", "reset", "save"):   # duplicate save coalesces
        _post(viewer.url + "/control", {"cmd": c})
    assert viewer.take_requests() == ["save", "gba", "reset"]
    assert viewer.take_requests() == []


def test_quit_releases_paused_loop(viewer):
    _post(viewer.url + "/control", {"cmd": "pause"})
    done = threading.Event()

    def loop_iter():
        viewer.wait_if_paused(poll=0.01)
        done.set()

    threading.Thread(target=loop_iter).start()
    _post(viewer.url + "/control", {"cmd": "quit"})
    assert done.wait(timeout=3.0)
    assert viewer.should_quit()


def test_unknown_command_rejected(viewer):
    assert not _post(viewer.url + "/control", {"cmd": "nonsense"})["ok"]
    st, _ = _get(viewer.url + "/state.json?v=-1")
    assert st == 200
