"""Diagnose the stereo loop geometry check on the synthetic circle (CPU)."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np

from pyslam_tpu.evaluation.metrics import eval_ate
from pyslam_tpu.features.tracker import FeatureTrackerConfig
from pyslam_tpu.io.dataset import SyntheticDataset
from pyslam_tpu.io.dataset_types import SensorType
from pyslam_tpu.slam.camera import PinholeCamera
from pyslam_tpu.slam.slam import Slam
from pyslam_tpu.loop_closing import loop_closing as lc_mod

from pyslam_tpu.config_parameters import Parameters

Parameters.kLoopClosingDirectIndexLevel = int(
    os.environ.get("DRILL_DI_LEVEL", 3))
Parameters.kLoopClosingFeatureMatchRatioTest = float(
    os.environ.get("DRILL_RATIO", 0.9))

ds = SyntheticDataset(num_frames=int(os.environ.get("DRILL_FRAMES", 175)),
                      period=int(os.environ.get("DRILL_PERIOD", 160)),
                      sensor_type=SensorType.STEREO,
                      trajectory="loop",
                      textured=os.environ.get("DRILL_TEXTURED", "0") == "1")
cam = PinholeCamera(ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
                    fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0)
cfg = FeatureTrackerConfig(num_features=600, num_levels=4)
slam = Slam(cam, cfg, loop_detector_config="DBOW3",
            sensor_type=SensorType.STEREO)

lc = slam.loop_closing
orig_geom = lc.geometry_check

# GT oracle: score the TRUE Sim3 (from dataset poses) on the same matched
# correspondences the RANSAC sees, to separate "matches are wrong" from
# "solver/sampling is wrong".
from pyslam_tpu.ops import procrustes as proc_mod

_cur_gt = {"S": None}
orig_ransac = proc_mod.sim3_ransac_reproj


def spy_ransac(key, p1, p2, uv1, uv2, s1, s2, valid, K1, K2, **kw):
    out = orig_ransac(key, p1, p2, uv1, uv2, s1, s2, valid, K1, K2, **kw)
    S_gt = _cur_gt["S"]
    if S_gt is not None:
        p1n, p2n = np.asarray(p1), np.asarray(p2)
        uv1n, uv2n = np.asarray(uv1), np.asarray(uv2)
        vn = np.asarray(valid)
        Kn = np.asarray(K1)

        def proj(S, p):
            q = (S[:3, :3] @ p.T).T + S[:3, 3]
            z = np.maximum(q[:, 2], 1e-6)
            return np.stack([Kn[0, 0] * q[:, 0] / z + Kn[0, 2],
                             Kn[1, 1] * q[:, 1] / z + Kn[1, 2]], 1)

        e1 = ((proj(S_gt, p2n) - uv1n) ** 2).sum(1) / np.asarray(s1)
        e2 = ((proj(np.linalg.inv(S_gt), p1n) - uv2n) ** 2).sum(1) / np.asarray(s2)
        gt_inl = int(((np.maximum(e1, e2) < 9.21) & vn).sum())
        print(f"[gt-oracle] true-Sim3 inliers={gt_inl}/{int(vn.sum())}",
              flush=True)
    return out


proc_mod.sim3_ransac_reproj = spy_ransac
lc_mod.procrustes.sim3_ransac_reproj = spy_ransac


def spy_geom(kf, cand):
    st = slam.map.points
    slots1 = np.nonzero(kf.points >= 0)[0]
    # oracle S12: p2 (cand est frame, ~drift-free) -> map world (cand est
    # Twc) -> ideal kf camera (GT pose expressed in the map's world frame,
    # which is the frame-0 camera frame)
    Tcw_kf_ideal = np.linalg.inv(ds.poses[kf.id]) @ ds.poses[0]
    _cur_gt["S"] = Tcw_kf_ideal @ cand.Twc
    ok, S12, n = orig_geom(kf, cand)
    _cur_gt["S"] = None
    print(f"[geom] kf={kf.kid} cand={cand.kid} slots1={len(slots1)} "
          f"-> ok={ok} n={n} (min_sim3={lc.min_sim3_inliers}, "
          f"min_match={lc.min_matched_points}, min_bow={lc.min_bow_matches})",
          flush=True)
    return ok, S12, n


lc.geometry_check = spy_geom

orig_cons = lc.consistency.check


def spy_cons(cands, covis):
    out = orig_cons(cands, covis)
    if cands:
        print(f"[consistency] cands={cands} -> consistent={out}", flush=True)
    return out


lc.consistency.check = spy_cons

for i in range(len(ds)):
    slam.track(ds.getImage(i), img_right=ds.getImageRight(i),
               frame_id=i, timestamp=ds.getTimestamp(i))
    if i % 20 == 0:
        print(f"frame {i}: kfs={slam.map.num_keyframes()} "
              f"loops={lc.num_loops_closed}", flush=True)

slam.finish()
print("loops closed:", lc.num_loops_closed)
ts, poses = slam.get_final_trajectory()
gt_t = np.array([ds.getTimestamp(i) for i in range(len(ds))])
res = eval_ate(ts, poses[:, :3, 3], gt_t, ds.poses[:, :3, 3], with_scale=False)
print("ATE:", res.rmse)
