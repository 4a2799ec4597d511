"""ROS1 bag v2.0: write -> read round trip, image codecs, dataset adapter."""

import numpy as np

from pyslam_tpu.io.ros1bag import (
    Ros1BagDataset, Ros1BagReader, Ros1BagWriter, decode_image, encode_image)


def test_image_codec_roundtrip():
    rng = np.random.default_rng(0)
    for img in (rng.integers(0, 255, (48, 64), np.uint8).astype(np.uint8),
                rng.integers(0, 255, (48, 64, 3)).astype(np.uint8),
                rng.uniform(0, 5, (48, 64)).astype(np.float32),
                rng.integers(0, 5000, (48, 64)).astype(np.uint16)):
        raw = encode_image(img, 12.345)
        out, ts, enc = decode_image(raw)
        assert abs(ts - 12.345) < 1e-6
        assert out.shape[:2] == (48, 64)
        assert np.allclose(np.asarray(out, np.float64),
                           np.asarray(img, np.float64))


def test_bag_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    path = str(tmp_path / "seq.bag")
    w = Ros1BagWriter(path)
    imgs, depths = [], []
    for i in range(5):
        img = rng.integers(0, 255, (32, 40), np.uint8).astype(np.uint8)
        depth = rng.integers(100, 5000, (32, 40)).astype(np.uint16)
        w.write_image("/cam0/image_raw", img, 100.0 + i * 0.1)
        w.write_image("/depth/image_raw", depth, 100.0 + i * 0.1 + 0.01)
        imgs.append(img)
        depths.append(depth)
    w.close()

    r = Ros1BagReader(path)
    summary = r.topics_summary()
    assert summary == {"/cam0/image_raw": 5, "/depth/image_raw": 5}

    ds = Ros1BagDataset(path, "/cam0/image_raw",
                        depth_topic="/depth/image_raw")
    assert len(ds) == 5
    assert np.array_equal(ds.getImage(2), imgs[2])
    d = ds.getDepth(2)
    assert d is not None
    assert np.allclose(d, depths[2].astype(np.float32) / 1000.0)
    assert abs(ds.getTimestamp(0) - 100.0) < 1e-6


def test_topic_filter(tmp_path):
    path = str(tmp_path / "f.bag")
    w = Ros1BagWriter(path)
    w.write_image("/a", np.zeros((8, 8), np.uint8), 1.0)
    w.write_image("/b", np.zeros((8, 8), np.uint8), 1.0)
    w.close()
    r = Ros1BagReader(path, topics=["/b"])
    assert r.topics_summary() == {"/b": 1}


def test_dataset_factory_ros1(tmp_path):
    path = str(tmp_path / "ds.bag")
    w = Ros1BagWriter(path)
    for i in range(3):
        w.write_image("/cam0/image_raw", np.zeros((16, 16), np.uint8),
                      10.0 + i)
    w.close()
    from pyslam_tpu.io.dataset_factory import dataset_factory

    ds = dataset_factory({"type": "ros1bag", "base_path": path,
                          "topic": "/cam0/image_raw"})
    assert len(ds) == 3
    assert ds.getImage(1).shape == (16, 16)
