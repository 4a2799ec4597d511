import numpy as np
import pytest

from pyslam_tpu.dense.semantic_volume import SemanticTSDFVolume
from pyslam_tpu.semantics.semantic_mapping import (
    SemanticMappingConfig,
    SemanticMappingDense,
    semantic_mapping_factory,
)
from pyslam_tpu.semantics.semantic_segmentation import (
    IntensityBandSegmentation,
    semantic_segmentation_factory,
)


def test_intensity_band_segmentation(rng):
    seg = IntensityBandSegmentation(num_classes=8)
    img = rng.uniform(0, 255, (60, 80)).astype(np.float32)
    out = seg.infer(img)
    assert out["labels"].shape == (60, 80)
    assert out["probs"].shape == (60, 80, 8)
    # label consistent with intensity band
    assert out["labels"][0, 0] == int(img[0, 0] / 256 * 8)
    np.testing.assert_allclose(out["probs"].sum(-1), 1.0, atol=1e-5)


def test_segmentation_factory():
    seg = semantic_segmentation_factory("intensity_bands", num_classes=5)
    assert seg.num_classes == 5


def test_semantic_mapping_fuses_point_labels(rng):
    from pyslam_tpu.slam.map import Map

    class FakeKF:
        pass

    m = Map()
    sm = semantic_mapping_factory(m, SemanticMappingConfig(num_classes=8))
    kf = FakeKF()
    kf.kps_raw = np.array([[10.0, 10.0], [50.0, 20.0]], np.float32)
    kf.points = np.array([0, 1])
    img = np.zeros((60, 80), np.float32)
    img[:, :40] = 40.0    # band 1
    img[:, 40:] = 200.0   # band 6
    sm.add_keyframe(kf, img=img)
    sm.run_all()
    assert sm.point_label(0) == int(40 / 256 * 8)
    assert sm.point_label(1) == int(200 / 256 * 8)
    assert sm.point_confidence(0) > 0.5
    assert hasattr(kf, "kps_sem")


def test_semantic_tsdf_volume():
    vol = SemanticTSDFVolume(
        num_classes=8, voxel_size=0.05, sdf_trunc=0.2, depth_trunc=5.0,
        capacity=1 << 16,
    )
    H, W = 60, 80
    K = np.array([[100.0, 0, 40], [0, 100.0, 30], [0, 0, 1]])
    depth = np.full((H, W), 2.0, np.float32)
    img = np.full((H, W), 128.0, np.float32)
    labels = np.full((H, W), 3, np.int32)
    labels[:, W // 2:] = 5
    vol.integrate_semantic(depth, img, labels, np.eye(4), K)
    pts, labs = vol.extract_semantic_point_cloud(tsdf_band=0.3, min_weight=0.5)
    assert len(pts) > 100
    vals, counts = np.unique(labs, return_counts=True)
    # both labels present, dominant ones are 3 and 5
    top2 = set(vals[np.argsort(-counts)][:2])
    assert top2 == {3, 5}


def test_learned_models_run(rng):
    """Flax model graphs compile and produce valid fixed-shape outputs
    (random weights; numerical parity needs converted checkpoints)."""
    from pyslam_tpu.models.superpoint import SuperPointExtractor
    from pyslam_tpu.models.xfeat import XFeatExtractor
    from pyslam_tpu.models.segformer import SegFormerInference

    img = rng.uniform(0, 255, (96, 128)).astype(np.float32)
    sp = SuperPointExtractor(num_features=100)
    f = sp(img)
    assert f.xy.shape == (100, 2) and f.desc.shape == (100, 256)

    xf = XFeatExtractor(num_features=100)
    f2 = xf(img)
    assert f2.xy.shape == (100, 2) and f2.desc.shape == (100, 64)

    seg = SegFormerInference(num_classes=7)
    out = seg.infer(img)
    assert out["labels"].shape == (96, 128)
    assert out["probs"].shape == (96, 128, 7)


def test_semantic_eval_metrics():
    import numpy as np

    from pyslam_tpu.semantics.semantic_eval import (
        confusion_matrix, evaluate_labels,
    )

    gt = np.array([[0, 0, 1, 1], [2, 2, 1, 1]])
    pred = np.array([[0, 1, 1, 1], [2, 2, 0, 1]])
    cm = confusion_matrix(pred, gt, 3)
    assert cm.sum() == 8
    assert cm[0, 0] == 1 and cm[0, 1] == 1  # one gt-0 misread as 1
    res = evaluate_labels(pred, gt, 3)
    # per-class: 0: inter1/union3, 1: inter3/union5, 2: inter2/union2
    assert abs(res.per_class_iou[0] - 1 / 3) < 1e-9
    assert abs(res.per_class_iou[1] - 3 / 5) < 1e-9
    assert abs(res.per_class_iou[2] - 1.0) < 1e-9
    assert abs(res.pixel_accuracy - 6 / 8) < 1e-9
    assert abs(res.miou - np.mean([1 / 3, 3 / 5, 1.0])) < 1e-9

    # ignore_label masks pixels out
    gt2 = gt.copy()
    gt2[0, 0] = -1
    res2 = evaluate_labels(pred, gt2, 3, ignore_label=-1)
    assert res2.num_evaluated == 7


def test_semantic_ba_weighting(rng):
    """kUseSemanticsInOptimization (reference optimizer_g2o.py:728-729):
    observations whose keypoint label carries a low information weight get
    an inflated sigma2 in the LBA edge assembly."""
    from pyslam_tpu.config_parameters import Parameters
    from pyslam_tpu.features.tracker import FeatureTrackerConfig
    from pyslam_tpu.io.dataset import SyntheticDataset
    from pyslam_tpu.io.dataset_types import SensorType
    from pyslam_tpu.semantics.semantic_mapping import (
        SemanticMappingConfig,
        SemanticMappingDense,
        semantic_information_weights,
    )
    from pyslam_tpu.slam.camera import PinholeCamera
    from pyslam_tpu.slam.slam import Slam

    w = semantic_information_weights("cityscapes", 19)
    assert w[8] == np.float32(0.001) and w[0] == 1.0  # vegetation down-weighted

    ds = SyntheticDataset(
        num_frames=10, sensor_type=SensorType.STEREO, trajectory="line",
        step=0.4,
    )
    cam = PinholeCamera(
        ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
        fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0,
    )
    slam = Slam(
        cam, FeatureTrackerConfig(num_features=400, num_levels=4),
        sensor_type=SensorType.STEREO,
    )
    sem = SemanticMappingDense(
        slam.map,
        SemanticMappingConfig(num_classes=19, dataset="cityscapes"),
    )
    slam.local_mapping.semantic_mapping = sem
    for i in range(len(ds)):
        slam.track(
            ds.getImage(i), img_right=ds.getImageRight(i),
            frame_id=i, timestamp=ds.getTimestamp(i),
        )
    slam.finish()
    lm = slam.local_mapping
    kf = slam.map.last_keyframe()

    # label half of every keyframe's keypoints as vegetation (class 8)
    for k in slam.map.keyframes.values():
        labels = np.zeros(len(k.kps), np.int64)
        labels[::2] = 8
        k.kps_sem = labels

    old_flag = Parameters.kUseSemanticsInOptimization
    try:
        Parameters.kUseSemanticsInOptimization = False
        built = lm._lba_build(kf)
        assert built is not None
        base_sig2 = np.asarray(built[0].sigma2)
        Parameters.kUseSemanticsInOptimization = True
        built_w = lm._lba_build(kf)
        sem_sig2 = np.asarray(built_w[0].sigma2)
    finally:
        Parameters.kUseSemanticsInOptimization = old_flag

    n = len(built[1]["cam_idx"])
    ratio = sem_sig2[:n] / base_sig2[:n]
    # even-slot keypoints (vegetation) inflate by 1/0.001; odd slots unchanged
    assert np.isclose(ratio.max(), 1000.0, rtol=1e-3)
    assert (np.isclose(ratio, 1.0) | np.isclose(ratio, 1000.0, rtol=1e-3)).all()
    assert np.isclose(ratio, 1000.0, rtol=1e-3).any()


def test_semantics_through_public_api():
    """Semantics wired through ``Slam.set_semantic_mapping`` (not attribute
    injection): ``Slam.track`` offers each keyframe's image, local mapping
    hands the keyframe to the mapper (kps_sem populated), and
    ``kUseSemanticsInOptimization`` changes the optimized trajectory —
    reference wiring: main_slam.py semantics + optimizer_g2o.py:728-729."""
    from pyslam_tpu.config_parameters import Parameters
    from pyslam_tpu.features.tracker import FeatureTrackerConfig
    from pyslam_tpu.io.dataset import SyntheticDataset
    from pyslam_tpu.io.dataset_types import SensorType
    from pyslam_tpu.semantics.semantic_mapping import (
        SemanticMappingConfig,
        SemanticMappingDense,
    )
    from pyslam_tpu.semantics.semantic_segmentation import (
        SemanticSegmentationBase,
    )
    from pyslam_tpu.slam.camera import PinholeCamera
    from pyslam_tpu.slam.slam import Slam

    class HalfVegetationSegmenter(SemanticSegmentationBase):
        """Left image half -> cityscapes 'vegetation' (weight 0.001)."""

        num_classes = 19

        def infer(self, img):
            img = np.asarray(img)
            labels = np.zeros(img.shape[:2], np.int64)
            labels[:, : img.shape[1] // 2] = 8
            return {"labels": labels}

    def run(use_sem: bool):
        ds = SyntheticDataset(
            num_frames=12, sensor_type=SensorType.STEREO, trajectory="line",
            step=0.4,
        )
        cam = PinholeCamera(
            ds.w, ds.h, ds.fx, ds.fy, ds.cx, ds.cy,
            fps=ds.fps, bf=ds.fx * ds.baseline, depth_threshold=20.0,
        )
        slam = Slam(
            cam, FeatureTrackerConfig(num_features=400, num_levels=4),
            sensor_type=SensorType.STEREO,
        )
        sem = SemanticMappingDense(
            slam.map,
            SemanticMappingConfig(num_classes=19, dataset="cityscapes"),
            segmenter=HalfVegetationSegmenter(),
        )
        slam.set_semantic_mapping(sem)           # the public API under test
        old = Parameters.kUseSemanticsInOptimization
        Parameters.kUseSemanticsInOptimization = use_sem
        try:
            for i in range(len(ds)):
                slam.track(
                    ds.getImage(i), img_right=ds.getImageRight(i),
                    frame_id=i, timestamp=ds.getTimestamp(i),
                )
                slam.local_mapping.finish()      # deterministic A/B
                sem.run_all()
            slam.finish()
        finally:
            Parameters.kUseSemanticsInOptimization = old
        return slam

    slam_a = run(False)
    slam_b = run(True)

    # handoff worked end-to-end: keyframes got per-keypoint labels with both
    # classes present (segmenter splits the image)
    labeled = [
        k for k in slam_b.map.keyframes.values()
        if getattr(k, "kps_sem", None) is not None
    ]
    assert len(labeled) >= 3, "local mapping never handed keyframes over"
    sems = np.concatenate([k.kps_sem for k in labeled])
    assert (sems == 8).any() and (sems == 0).any()

    # the BA weighting changed the optimized keyframe trajectory (keyframe
    # ids are globally monotonic across Slam instances — align by position)
    order_a = [slam_a.map.keyframes[k] for k in slam_a.map.keyframe_order]
    order_b = [slam_b.map.keyframes[k] for k in slam_b.map.keyframe_order]
    n = min(len(order_a), len(order_b))
    assert n >= 3
    deltas = [
        np.abs(order_a[i].Tcw - order_b[i].Tcw).max() for i in range(n)
    ]
    assert max(deltas) > 1e-7, (
        "kUseSemanticsInOptimization had no effect through the public API"
    )
