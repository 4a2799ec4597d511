"""COLMAP model I/O: text round-trip, binary readers, qvec math, map export."""

import struct

import numpy as np

from pyslam_tpu.io import colmap_io as C


def _model():
    cams = {1: C.ColmapCamera(1, "PINHOLE", 640, 480,
                              np.array([500.0, 500.0, 320.0, 240.0]))}
    q = C.R_to_qvec(np.eye(3))
    imgs = {
        1: C.ColmapImage(1, q, np.array([0.1, 0.2, 0.3]), 1, "a.png",
                         np.array([[10.0, 20.0], [30.0, 40.0]]),
                         np.array([7, -1], np.int64)),
        2: C.ColmapImage(2, C.R_to_qvec(C.qvec_to_R(
            np.array([0.9238795, 0.0, 0.3826834, 0.0]))),
            np.array([1.0, 0.0, 0.0]), 1, "b.png"),
    }
    pts = {7: C.ColmapPoint3D(7, np.array([1.0, 2.0, 3.0]),
                              np.array([10, 20, 30], np.uint8), 0.5,
                              np.array([1], np.int64),
                              np.array([0], np.int64))}
    return cams, imgs, pts


def test_text_roundtrip(tmp_path):
    cams, imgs, pts = _model()
    C.write_model_text(cams, imgs, pts, str(tmp_path))
    c2, i2, p2 = C.read_model(str(tmp_path))
    assert c2[1].model == "PINHOLE" and c2[1].width == 640
    assert np.allclose(c2[1].params, cams[1].params)
    assert np.allclose(i2[1].qvec, imgs[1].qvec, atol=1e-8)
    assert np.allclose(i2[1].xys, imgs[1].xys)
    assert list(i2[1].point3D_ids) == [7, -1]
    assert np.allclose(p2[7].xyz, [1, 2, 3])
    assert list(p2[7].image_ids) == [1]


def test_qvec_twc():
    q = np.array([0.9238795, 0.0, 0.3826834, 0.0])
    q /= np.linalg.norm(q)
    t = np.array([1.0, -2.0, 3.0])
    T = C.colmap_qvec_tvec_to_Twc(q, t)
    R = C.qvec_to_R(q)
    # world->cam applied after cam->world must be identity
    Tcw = np.eye(4)
    Tcw[:3, :3] = R
    Tcw[:3, 3] = t
    assert np.allclose(Tcw @ T, np.eye(4), atol=1e-10)
    assert np.allclose(C.R_to_qvec(R), q, atol=1e-8)


def test_binary_readers(tmp_path):
    cams, imgs, pts = _model()
    # write minimal binary files per the COLMAP spec
    with open(tmp_path / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 640, 480))
        f.write(struct.pack("<dddd", *cams[1].params))
    with open(tmp_path / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        im = imgs[1]
        f.write(struct.pack("<idddddddi", 1, *im.qvec, *im.tvec, 1))
        f.write(b"a.png\x00")
        f.write(struct.pack("<Q", 2))
        for (x, y), pid in zip(im.xys, im.point3D_ids):
            f.write(struct.pack("<ddq", x, y, pid))
    with open(tmp_path / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        p = pts[7]
        f.write(struct.pack("<QdddBBBd", 7, *p.xyz, *p.rgb, p.error))
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<ii", 1, 0))
    c2, i2, p2 = C.read_model(str(tmp_path))
    assert np.allclose(c2[1].params, cams[1].params)
    assert i2[1].name == "a.png"
    assert np.allclose(i2[1].xys, imgs[1].xys)
    assert list(i2[1].point3D_ids) == [7, -1]
    assert np.allclose(p2[7].xyz, [1, 2, 3])
    assert list(p2[7].image_ids) == [1]


def test_map_export(tmp_path):
    """Run a few synthetic SLAM frames and export the map to COLMAP."""
    from pyslam_tpu.io.dataset import SyntheticDataset
    from pyslam_tpu.slam.camera import PinholeCamera
    from pyslam_tpu.slam.slam import Slam, SensorType

    ds = SyntheticDataset(num_frames=8, sensor_type=SensorType.RGBD,
                          trajectory="line", step=0.3)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                        bf=ds.fx * 0.2, depth_threshold=20.0)
    slam = Slam(cam, "ORB2", sensor_type=SensorType.RGBD)
    for i in range(8):
        slam.track(ds.getImage(i), depth=ds.getDepth(i), frame_id=i,
                   timestamp=ds.getTimestamp(i))
    out = C.map_to_colmap(slam.map, cam, str(tmp_path / "sparse"))
    cams, imgs, pts = C.read_model(out)
    assert len(cams) == 1 and len(imgs) >= 1 and len(pts) > 50
    # observation tracks must index valid images
    some = next(iter(pts.values()))
    for iid in some.image_ids:
        assert iid in imgs
