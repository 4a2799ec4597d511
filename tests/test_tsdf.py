import jax.numpy as jnp
import numpy as np

from pyslam_tpu.dense.tsdf import TSDFVolume
from pyslam_tpu.dense.volumetric_integrator import (
    VolumetricIntegrator,
    VolumetricIntegratorType,
    volumetric_integrator_factory,
)
from pyslam_tpu.ops import voxel_hash


def test_hash_insert_lookup_roundtrip(rng):
    table = voxel_hash.make_table(1 << 14)
    coords = rng.integers(-100, 100, (500, 3)).astype(np.int32)
    coords = np.unique(coords, axis=0)
    n = len(coords)
    table = voxel_hash.insert_and_accumulate(
        table,
        jnp.asarray(coords),
        jnp.ones((n,)) * 0.5,
        jnp.ones((n,)),
        jnp.zeros((n, 3)),
        jnp.ones((n,), bool),
    )
    tsdf, w = voxel_hash.gather_values(table, jnp.asarray(coords))
    np.testing.assert_allclose(np.asarray(tsdf), 0.5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(w), 1.0, atol=1e-6)
    # absent coords return weight 0
    other = coords + 1000
    _, w2 = voxel_hash.gather_values(table, jnp.asarray(other))
    assert np.asarray(w2).max() == 0.0


def test_hash_duplicate_updates_average(rng):
    table = voxel_hash.make_table(1 << 12)
    # same voxel updated 4 times with different sdf in ONE batch
    coords = np.tile(np.array([[3, 4, 5]], np.int32), (4, 1))
    sdf = jnp.asarray([0.0, 1.0, 1.0, 2.0])
    table = voxel_hash.insert_and_accumulate(
        table, jnp.asarray(coords), sdf, jnp.ones((4,)),
        jnp.zeros((4, 3)), jnp.ones((4,), bool),
    )
    t, w = voxel_hash.gather_values(table, jnp.asarray(coords[:1]))
    assert abs(float(t[0]) - 1.0) < 1e-6
    assert abs(float(w[0]) - 4.0) < 1e-6
    # second batch fuses with running average
    table = voxel_hash.insert_and_accumulate(
        table, jnp.asarray(coords[:1]), jnp.asarray([3.0]), jnp.asarray([4.0]),
        jnp.zeros((1, 3)), jnp.ones((1,), bool),
    )
    t, w = voxel_hash.gather_values(table, jnp.asarray(coords[:1]))
    assert abs(float(t[0]) - 2.0) < 1e-6  # (1*4 + 3*4)/8
    assert abs(float(w[0]) - 8.0) < 1e-6


def test_tsdf_integrates_flat_wall():
    """Synthetic camera looking at a plane z=2: the zero crossing must be
    reconstructed near z=2."""
    vol = TSDFVolume(voxel_size=0.05, sdf_trunc=0.2, depth_trunc=5.0, capacity=1 << 16)
    H, W = 120, 160
    K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
    depth = np.full((H, W), 2.0, np.float32)
    img = np.full((H, W), 128.0, np.float32)
    vol.integrate(depth, img, np.eye(4), K)
    assert vol.num_voxels() > 500
    pts, cols = vol.extract_point_cloud(tsdf_band=0.3, min_weight=0.5)
    assert len(pts) > 200
    # surface points concentrated near z=2
    assert abs(np.median(pts[:, 2]) - 2.0) < 0.1
    assert np.percentile(np.abs(pts[:, 2] - 2.0), 90) < 0.16


def test_tsdf_multiview_consistency():
    """Two views of the same plane: integration must refine, not duplicate."""
    vol = TSDFVolume(voxel_size=0.05, sdf_trunc=0.2, depth_trunc=5.0, capacity=1 << 16)
    H, W = 120, 160
    K = np.array([[100.0, 0, 80], [0, 100.0, 60], [0, 0, 1]])
    depth = np.full((H, W), 2.0, np.float32)
    img = np.full((H, W), 128.0, np.float32)
    vol.integrate(depth, img, np.eye(4), K)
    n1 = vol.num_voxels()
    # second view from 10cm left, same plane -> depth still 2.0
    Twc = np.eye(4)
    Twc[0, 3] = 0.1
    vol.integrate(depth, img, Twc, K)
    n2 = vol.num_voxels()
    assert n2 < n1 * 1.5  # mostly revisits, limited growth
    pts, _ = vol.extract_point_cloud(tsdf_band=0.3, min_weight=0.5)
    assert abs(np.median(pts[:, 2]) - 2.0) < 0.1


def test_integrator_rebuild_replays(rng):
    from pyslam_tpu.slam.camera import PinholeCamera

    cam = PinholeCamera(160, 120, 100, 100, 80, 60)
    integ = volumetric_integrator_factory(
        VolumetricIntegratorType.TSDF, camera=cam,
        voxel_size=0.05, capacity=1 << 16,
    )

    class FakeKF:
        def __init__(self, kid, Twc):
            self.kid = kid
            self.Twc = Twc

    depth = np.full((120, 160), 2.0, np.float32)
    kf = FakeKF(0, np.eye(4))
    integ.add_keyframe(kf, depth=depth, intensity=np.full((120, 160), 100.0))
    integ.run_all()
    n1 = integ.volume.num_voxels()
    assert n1 > 100

    class FakeMap:
        keyframe_order = [0]
        keyframes = {0: kf}

    kf.Twc = np.eye(4)
    integ.rebuild(FakeMap())
    assert abs(integ.volume.num_voxels() - n1) < n1 * 0.2


def test_marching_tetrahedra_sphere():
    """Analytic sphere SDF -> mesh: vertices must lie on the sphere within a
    voxel, faces must be valid, and the PLY round-trips."""
    import os
    import tempfile

    import numpy as np

    from pyslam_tpu.dense.marching import load_ply, marching_tetrahedra, save_ply

    R, vs = 1.0, 0.1
    rng_lim = int(R / vs) + 3
    g = np.arange(-rng_lim, rng_lim + 1)
    X, Y, Z = np.meshgrid(g, g, g, indexing="ij")
    keys = np.stack([X.ravel(), Y.ravel(), Z.ravel()], 1)
    centers = (keys + 0.5) * vs
    sdf = (np.linalg.norm(centers, axis=1) - R) / (3 * vs)  # truncated-ish
    band = np.abs(sdf) < 1.0
    keys, sdf = keys[band], np.clip(sdf[band], -1, 1)
    cols = np.full((len(keys), 3), 200.0)

    verts, faces, vcols = marching_tetrahedra(keys, sdf, cols, voxel_size=vs)
    assert len(verts) > 200 and len(faces) > 200
    r = np.linalg.norm(verts, axis=1)
    assert np.abs(r - R).max() < 1.5 * vs, np.abs(r - R).max()
    assert faces.min() >= 0 and faces.max() < len(verts)
    # every face references three distinct vertices
    assert (faces[:, 0] != faces[:, 1]).all()

    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "m.ply")
        save_ply(p, verts, faces, vcols)
        v2, f2, c2 = load_ply(p)
        assert len(v2) == len(verts) and len(f2) == len(faces)
        np.testing.assert_allclose(v2, verts, atol=1e-4)


def test_tsdf_extract_mesh_from_integration(rng):
    """Integrate a flat wall from synthetic depth; the mesh must be a plane
    at the right depth."""
    import numpy as np

    from pyslam_tpu.dense.tsdf import TSDFVolume

    h, w = 64, 80
    K = np.array([[70.0, 0, 40.0], [0, 70.0, 32.0], [0, 0, 1]], np.float32)
    depth = np.full((h, w), 2.0, np.float32)
    gray = np.full((h, w), 128.0, np.float32)
    vol = TSDFVolume(voxel_size=0.05, sdf_trunc=0.15, capacity=1 << 18)
    for _ in range(3):
        vol.integrate(depth, gray, np.eye(4), K)
    verts, faces, cols = vol.extract_mesh()
    assert len(verts) > 100 and len(faces) > 100
    # wall at z=2: all mesh vertices near that plane
    assert np.abs(verts[:, 2] - 2.0).max() < 0.08, np.abs(verts[:, 2] - 2.0).max()
