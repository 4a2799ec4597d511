import jax.numpy as jnp
import numpy as np
import pytest

from pyslam_tpu.evaluation.metrics import eval_ate
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.ops import lk
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.visual_odometry_rgbd import VisualOdometryRgbd
from tests.test_features import synth_image


def test_lk_recovers_translation(rng):
    base = synth_image(rng, 256, 320)
    dx, dy = 5.0, -3.0
    img0 = base[8:-8, 8:-8]
    img1 = base[8 + 3 : -8 + 3, 8 - 5 : -8 - 5]  # shifted crop => flow (5,-3)
    from pyslam_tpu.ops import fast, nms

    score = fast.nms3x3(fast.fast_score_map(jnp.asarray(img0), 20.0))
    xy, _, valid = nms.grid_topk_keypoints(score, 16, 4, 200)
    pts0 = np.asarray(xy)[np.asarray(valid)]
    pts1, ok, res = lk.lk_track_pyramidal(
        jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(pts0)
    )
    pts1, ok = np.asarray(pts1), np.asarray(ok)
    flow = pts1[ok] - pts0[ok]
    assert ok.sum() > 50
    med = np.median(flow, axis=0)
    np.testing.assert_allclose(med, [dx, dy], atol=0.5)


@pytest.mark.slow
def test_vo_rgbd_on_synthetic():
    ds = SyntheticDataset(num_frames=15, sensor_type=SensorType.RGBD,
                          trajectory="line", step=0.3)
    cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy, fps=ds.fps)
    vo = VisualOdometryRgbd(cam)
    for i in range(len(ds)):
        vo.track(ds.getImage(i), ds.getDepth(i), i, ds.getTimestamp(i))
    gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
    res = eval_ate(np.asarray(vo.timestamps), vo.trajectory,
                   gt_t, ds.poses[:, :3, 3], with_scale=False)
    # 4.2m path with metric depth: scale correct without GT
    assert res.rmse < 0.35, res
