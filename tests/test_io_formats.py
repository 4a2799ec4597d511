"""New dataset loaders: directory-format datasets built in tmp_path, plus
ROS2 bag (.db3) and MCAP round-trips through our pure-Python writers."""

import os

import numpy as np
import pytest
from PIL import Image

from pyslam_tpu.io.dataset_factory import dataset_factory


def _png(path, arr):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr).save(path)


@pytest.fixture
def gray(rng):
    return rng.integers(0, 255, (24, 32)).astype(np.uint8)


@pytest.fixture
def depth16(rng):
    return rng.integers(500, 5000, (24, 32)).astype(np.uint16)


def test_replica_loader(tmp_path, gray, depth16):
    root = str(tmp_path)
    for i in range(3):
        _png(f"{root}/results/frame{i:06d}.png", gray)
        _png(f"{root}/results/depth{i:06d}.png", depth16)
    ds = dataset_factory({"type": "replica", "base_path": root, "sensor_type": "rgbd"})
    assert len(ds) == 3
    assert ds.getImage(0).shape == (24, 32)
    d = ds.getDepth(1)
    np.testing.assert_allclose(d, depth16 / 6553.5, rtol=1e-6)


def test_tartanair_loader(tmp_path, gray, rng):
    root = str(tmp_path)
    depth = rng.uniform(1, 20, (24, 32)).astype(np.float32)
    for i in range(2):
        _png(f"{root}/image_left/{i:06d}_left.png", gray)
        os.makedirs(f"{root}/depth_left", exist_ok=True)
        np.save(f"{root}/depth_left/{i:06d}_left_depth.npy", depth)
    ds = dataset_factory({"type": "tartanair", "base_path": root, "sensor_type": "rgbd"})
    assert len(ds) == 2
    np.testing.assert_allclose(ds.getDepth(0), depth)


def test_scannet_loader_numeric_order(tmp_path, gray, depth16):
    root = str(tmp_path)
    # 10 frames: lexical sort would order 0,1,10... — loader must sort by int
    for i in range(11):
        _png(f"{root}/color/{i}.png", gray + i)
        _png(f"{root}/depth/{i}.png", depth16)
    ds = dataset_factory({"type": "scannet", "base_path": root, "sensor_type": "rgbd"})
    assert len(ds) == 11
    # frame 10 must be the 11th, not the 2nd
    assert ds.rgb[1].endswith("/1.png") and ds.rgb[10].endswith("/10.png")
    np.testing.assert_allclose(ds.getDepth(0), depth16 / 1000.0, rtol=1e-6)


def test_seven_scenes_invalid_depth(tmp_path, gray, depth16):
    root = str(tmp_path)
    depth = depth16.copy()
    depth[0, 0] = 65535  # 7-scenes invalid marker
    for i in range(2):
        _png(f"{root}/seq-01/frame-{i:06d}.color.png", gray)
        _png(f"{root}/seq-01/frame-{i:06d}.depth.png", depth)
    ds = dataset_factory(
        {"type": "seven_scenes", "base_path": root, "sequence": "seq-01",
         "sensor_type": "rgbd"}
    )
    d = ds.getDepth(0)
    assert d[0, 0] == 0.0  # invalid -> 0
    assert abs(d[5, 5] - depth[5, 5] / 1000.0) < 1e-6


def test_neural_rgbd_loader(tmp_path, gray, depth16):
    root = str(tmp_path)
    for i in range(2):
        _png(f"{root}/images/img{i:04d}.png", gray)
        _png(f"{root}/depth/depth{i:04d}.png", depth16)
    ds = dataset_factory({"type": "neural_rgbd", "base_path": root, "sensor_type": "rgbd"})
    assert len(ds) == 2 and ds.getImage(0) is not None


# ------------------------------------------------------------- ROS2 and MCAP
def test_cdr_image_roundtrip(rng):
    from pyslam_tpu.io.ros2bag import decode_image, encode_image

    img = rng.integers(0, 255, (16, 20)).astype(np.uint8)
    blob = encode_image(img, stamp=12.345678, encoding="mono8", frame_id="cam0")
    m = decode_image(blob)
    assert m.frame_id == "cam0"
    assert abs(m.stamp - 12.345678) < 1e-6
    np.testing.assert_array_equal(m.to_array(), img.astype(np.float32))

    d = rng.integers(0, 60000, (16, 20)).astype(np.uint16)
    m2 = decode_image(encode_image(d, 1.0, encoding="16UC1"))
    np.testing.assert_array_equal(m2.to_array(), d.astype(np.float32))


def test_ros2bag_dataset_roundtrip(tmp_path, rng):
    from pyslam_tpu.io.ros2bag import Ros2BagWriter, encode_image

    path = str(tmp_path / "bag.db3")
    w = Ros2BagWriter(path)
    w.add_topic("/cam/image", "sensor_msgs/msg/Image")
    w.add_topic("/cam/depth", "sensor_msgs/msg/Image")
    imgs, deps = [], []
    for i in range(4):
        img = rng.integers(0, 255, (16, 20)).astype(np.uint8)
        dep = rng.integers(100, 5000, (16, 20)).astype(np.uint16)
        t_ns = int(1e9 * (100 + i * 0.1))
        w.write("/cam/image", t_ns, encode_image(img, 100 + i * 0.1))
        # depth arrives 3ms later: within the sync tolerance
        w.write("/cam/depth", t_ns + 3_000_000,
                encode_image(dep, 100 + i * 0.1 + 0.003, encoding="16UC1"))
        imgs.append(img)
        deps.append(dep)
    w.close()

    ds = dataset_factory(
        {"type": "ros2bag", "base_path": path, "topic": "/cam/image",
         "depth_topic": "/cam/depth"}
    )
    assert len(ds) == 4
    np.testing.assert_array_equal(ds.getImage(2), imgs[2].astype(np.float32))
    np.testing.assert_allclose(ds.getDepth(1), deps[1] / 1000.0, rtol=1e-6)
    assert abs(ds.getTimestamp(0) - 100.0) < 1e-6


def test_mcap_dataset_roundtrip(tmp_path, rng):
    from pyslam_tpu.io.mcap_io import McapReader, McapWriter
    from pyslam_tpu.io.ros2bag import encode_image

    path = str(tmp_path / "log.mcap")
    w = McapWriter(path)
    sid = w.add_schema("sensor_msgs/msg/Image")
    w.add_channel("/cam/image", sid)
    frames = []
    for i in range(3):
        img = rng.integers(0, 255, (12, 16)).astype(np.uint8)
        w.write_message("/cam/image", int(1e9 * (5 + i)), encode_image(img, 5 + i), i)
        frames.append(img)
    w.close()

    r = McapReader(path)
    msgs = list(r.messages("/cam/image"))
    assert len(msgs) == 3
    assert msgs[0].channel.topic == "/cam/image"

    ds = dataset_factory({"type": "mcap", "base_path": path, "topic": "/cam/image"})
    assert len(ds) == 3
    np.testing.assert_array_equal(ds.getImage(1), frames[1].astype(np.float32))
    assert abs(ds.getTimestamp(2) - 7.0) < 1e-9
