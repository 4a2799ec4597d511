"""TSDF spatial queries: bbox crop, frustum culling, space carving."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def volume():
    from pyslam_tpu.dense.tsdf import TSDFVolume

    vol = TSDFVolume(voxel_size=0.05, sdf_trunc=0.15, depth_trunc=5.0,
                     capacity=1 << 15)
    # integrate a flat wall at z = 2m seen from the origin
    H, W = 60, 80
    K = np.array([[60.0, 0, 40], [0, 60.0, 30], [0, 0, 1]], np.float32)
    depth = np.full((H, W), 2.0, np.float32)
    intensity = np.full((H, W), 128.0, np.float32)
    vol.integrate(depth, intensity, np.eye(4, dtype=np.float32), K)
    vol._K, vol._hw = K, (H, W)
    return vol


def test_bbox_queries(volume):
    n_total = volume.num_voxels()
    assert n_total > 100
    in_wall = volume.voxels_in_bbox([-5, -5, 1.7], [5, 5, 2.3])
    assert in_wall.sum() > 0.9 * n_total        # the wall band holds ~all
    in_empty = volume.voxels_in_bbox([-5, -5, 4.0], [5, 5, 5.0])
    assert in_empty.sum() == 0


def test_frustum_culling(volume):
    inside = volume.voxels_in_frustum(np.eye(4), volume._K, volume._hw)
    assert inside.sum() > 0.9 * volume.num_voxels()
    # a camera looking AWAY sees nothing
    T = np.eye(4)
    T[:3, :3] = np.diag([1.0, -1.0, -1.0])      # 180-deg flip about x
    away = volume.voxels_in_frustum(T, volume._K, volume._hw)
    assert away.sum() == 0


def test_carving(volume):
    from copy import deepcopy

    vol = deepcopy(volume)
    n0 = vol.num_voxels()
    # a depth map reporting the surface FARTHER (3m) carves the 2m wall band
    H, W = vol._hw
    carved = vol.carve(np.full((H, W), 3.0, np.float32), np.eye(4), vol._K)
    assert carved > 0.8 * n0
    assert vol.num_voxels() < 0.2 * n0


def test_crop_bbox(volume):
    from copy import deepcopy

    vol = deepcopy(volume)
    n0 = vol.num_voxels()
    vol.crop_bbox([-0.5, -0.5, 0.0], [0.5, 0.5, 5.0])   # central column
    assert 0 < vol.num_voxels() < n0
    pts, _ = vol.extract_point_cloud()
    assert (np.abs(pts[:, :2]) <= 0.55).all()


def test_carve_then_reintegrate_fresh_state(volume):
    """Regression: carving must zero the freed slots' accumulators.

    Otherwise insert_and_accumulate re-claims ~occupied slots as empty and
    blends fresh updates into the stale tsdf/weight (w_old up to 200) —
    carved voxels resurrect their old state."""
    from copy import deepcopy

    vol = deepcopy(volume)
    H, W = vol._hw
    # saturate the wall's weights with repeated integration
    depth = np.full((H, W), 2.0, np.float32)
    inten = np.full((H, W), 128.0, np.float32)
    for _ in range(5):
        vol.integrate(depth, inten, np.eye(4, dtype=np.float32), vol._K)
    carved = vol.carve(np.full((H, W), 3.0, np.float32), np.eye(4), vol._K)
    assert carved > 0
    # freed slots must hold zeroed accumulators
    occ = np.asarray(vol.table.occupied)
    assert np.all(np.asarray(vol.table.weight)[~occ] == 0.0)
    assert np.all(np.asarray(vol.table.tsdf)[~occ] == 0.0)
    # re-integrating a DIFFERENT surface must not inherit stale weights:
    # one integration pass => per-voxel weight bounded by a single pass's
    # contribution, far below the saturated 5-pass value
    vol.integrate(np.full((H, W), 2.5, np.float32), inten,
                  np.eye(4, dtype=np.float32), vol._K)
    pts, _ = vol.extract_point_cloud(min_weight=0.5)
    assert len(pts) > 0
    # all live voxels near the new surface, none resurrected at z~2.0
    zs = pts[:, 2]
    assert (np.abs(zs - 2.5) < 0.25).sum() > 0.9 * len(zs)
