"""Global framework parameters (flag registry).

TPU-native analog of the reference's static ``Parameters`` class
(``pyslam/config_parameters.py:45+`` in luigifreda/pyslam): a single class of
``k*`` class attributes that every subsystem reads, overridable from YAML via
``Config.apply_global_parameters`` (the reference's GLOBAL_PARAMETERS hook,
``pyslam/config.py:219``).

Values are chosen to match the reference's documented defaults where behavior
parity matters (keyframe thresholds, covisibility minima, BA windows); flags
that only made sense for the thread/process architecture are replaced by their
TPU-scheduler equivalents.
"""

from __future__ import annotations


class Parameters:
    # ------------------------------------------------------------------ core
    kNumFeatures = 2000                     # padded keypoint capacity per frame
    kNumLevels = 8                          # image pyramid levels
    kScaleFactor = 1.2                      # pyramid scale factor
    kFASTThreshold = 20                     # FAST corner threshold (initial)
    kFASTMinThreshold = 7                   # relaxed threshold for empty cells
    kUsePallasFAST = True                   # fused Pallas FAST+NMS kernel (TPU backend only)
    kSigmaLevel0 = 1.0                      # keypoint measurement sigma at level 0

    # ------------------------------------------------------------ matching
    kMaxDescriptorDistance = 100            # ORB Hamming acceptance (ref feature_types.py:164)
    kMatchRatioTest = 0.75                  # Lowe ratio for generic matching
    kMatchRatioTestMap = 0.8                # ratio used when matching against map
    kCheckOrientation = True                # rotation-histogram consistency filter
    kNumRotHistogramBins = 30               # bins in rotation histogram
    kRotHistogramKeepTopN = 3               # keep matches in top-N bins

    # ------------------------------------------------------------- tracking
    kUseMotionModel = True
    kMinNumMatchedFeaturesSearchFrameByProjection = 20
    kMaxReprojectionDistanceFrame = 7       # px radius, search prev frame by projection
    kMaxReprojectionDistanceFrameWide = 14  # widened radius on failure
    kMaxReprojectionDistanceMap = 3         # px radius, search map by projection
    kMaxReprojectionDistanceMapRelocalize = 5
    kMinTrackedFeaturesForPoseOpt = 10
    kNumMinInliersPoseOptimizationTrackFrame = 10
    kNumMinInliersTrackLocalMap = 30
    kNumMinInliersTrackLocalMapForNotPausingLocalMapping = 50
    kUseSearchFrameByProjection = True
    kMaxNumOfKeyframesInLocalMap = 80
    kNumMinObsForKeyFrameDefault = 3

    # ---------------------------------------------------------- keyframes
    kNumMinPointsForNewKf = 15              # min tracked points to allow a new KF
    kThNewKfRefRatio = 0.9                  # cond: tracked/ref-tracked ratio (mono)
    kThNewKfRefRatioStereo = 0.75           # stereo variant
    kNumMaxFramesBetweenKfs = 30            # cond1a: max frames since last KF (~fps)
    kNumMinFramesBetweenKfs = 0             # min frames between KFs
    kThNewKfMinCloseFeaturesRatio = 0.25    # stereo/RGBD close-point condition
    kNumMinClosePointsForNewKf = 100

    # ------------------------------------------------------- local mapping
    kLocalBAWindowSize = 20                 # covisibility window for LBA (ref :221)
    kKeyframeCullingRedundantObsRatio = 0.9 # cull KF if 90% points redundantly seen
    kKeyframeCullingMinNumPoints = 3
    kMapPointCullingMinFoundRatio = 0.25    # found/visible acceptance for new points
    kNumMinObsForCulling = 3
    kUseLargeWindowBA = False
    kLargeBAWindowSize = 20

    # ------------------------------------------------------------ optimizer
    kOptimizerPoseItsRounds = 4             # motion-only: 4 rounds
    kOptimizerPoseItsPerRound = 10          # x 10 LM iterations
    kChi2Mono = 5.991                       # chi-square 2 dof 95%
    kChi2Stereo = 7.815                     # chi-square 3 dof 95%
    kOptimizerLBAIterations = 10
    # LBA problem caps = the ONE padded TPU shape (cameras / points /
    # observations); each distinct shape is a separate XLA compile, so the
    # TPU path always pads to exactly these (see local_mapping._lba_build)
    kLBAMaxCameras = 56          # >= window (20+1) + capped fixed set
    kLBAMaxPoints = 4096
    kLBAMaxObservations = 16384
    kOptimizerGBAIterations = 15
    kOptimizerPGOIterations = 30

    # --------------------------------------------------------- loop closing
    kUseLoopClosing = True
    kLoopClosingMinNumConsistentGroups = 3  # consistency threshold (ref loop_closing.py:107)
    kLoopClosingNumCovisiblesForCandidate = 10
    kLoopClosingMinNumMatchedMapPoints = 40 # geometry check acceptance (ref :257)
    kLoopClosingGeometryCheckerMinNumBoWMatches = 20
    kLoopClosingTh2 = 10.0
    kLoopClosingMaxFramesBetweenDetections = 10
    kLoopDetectionMinFramesAfterLastDetection = 10
    kLoopDetectionMinKeyframeDistance = 10  # candidate must be >= N keyframes old (temporal gate)
    kRetainImageForVPR = False              # keep half-res frame copies for learned VPR (NetVLAD-class)
    kSim3SolverRansacIterations = 300
    kSim3SolverMinInliers = 20
    kUseEssentialGraphPGO = True
    kGBAUseRobustKernel = True

    # -------------------------------------------------------- relocalization
    kRelocalizationMinPnPInliers = 15
    kRelocalizationFinalMinNumInliers = 50  # accept relocalization with >=50 inliers
    kRelocalizationPnPRansacIterations = 256
    kMaxLostFramesBeforeReset = 5           # auto-reset if LOST early (ref tracking.py:1424)

    # -------------------------------------------------------------- stereo
    kStereoMatchingRowTolerance = 2.0       # rows tolerance for rectified match
    kStereoMatchingMaxDescriptorDistance = 100
    kMinDepth = 0.1

    # ----------------------------------------------------------- map points
    kViewingCosLimitForPoint = 0.5          # view-angle gate in map search
    kScaleConsistencyFactor = 1.5
    kMaxOrbDistanceSearchByReproj = 50      # descriptor gate on projection search
    kCosMaxParallax = 0.9998                # triangulation parallax acceptance
    kMinRatioBaselineDepth = 0.01

    # -------------------------------------------------------------- dense
    kVolumetricIntegrationVoxelSize = 0.05
    kVolumetricIntegrationSdfTrunc = 0.2
    kVolumetricIntegrationDepthTruncIndoor = 4.0
    kVolumetricIntegrationDepthTruncOutdoor = 10.0
    kVolumetricIntegrationMinNumLBATimes = 1
    kVolumetricIntegrationUseDepthEstimator = False
    # estimator used when kVolumetricIntegrationUseDepthEstimator is on
    # (reference kVolumetricIntegrationDepthEstimatorType, defaults to the
    # native SGM stereo matcher; monocular runs use a learned estimator)
    kVolumetricIntegrationDepthEstimatorType = "sgbm"
    kVolumetricIntegrationTableCapacity = 1 << 20  # voxel-hash table slots

    # ------------------------------------------------------------ semantics
    kSemanticMappingOnSeparateThread = False
    kSemanticMappingNumClasses = 21
    kDoSparseSemanticMapping = True

    # --------------------------------------------------------------- system
    kLocalMappingOnSeparateThread = False   # TPU build: host scheduler interleave
    kTrackingWaitForLocalMappingToGetIdle = False
    kUseVolumetricIntegration = False
    kUseSemanticMapping = False
    kLogKFinfoToFile = False
    kUseDynamicDesDistanceTh = True         # adaptive descriptor threshold (MAD stats)
    kUseFusedTrackingStep = True            # one-dispatch OK-path tracking (ops/fused_tracking.py)

    # ---------------------------------------------------------------- TPU
    kDeviceMatchTileSize = 512              # pallas tile for distance kernels
    kUseBfloat16Pyramid = False             # pyramid compute dtype
    kMapPointCapacityInitial = 1 << 15      # initial SoA map-point capacity
    kKeyFrameCapacityInitial = 256          # initial keyframe capacity
    kObsPadPerFrame = 4096                  # padded observations per BA frame

    @classmethod
    def set_from_dict(cls, d: dict) -> None:
        """Override flags from a dict (YAML GLOBAL_PARAMETERS hook)."""
        for k, v in d.items():
            if not hasattr(cls, k):
                raise KeyError(f"unknown Parameters flag: {k}")
            setattr(cls, k, v)

    @classmethod
    def as_dict(cls) -> dict:
        return {
            k: v for k, v in vars(cls).items()
            if k.startswith("k") and not callable(v)
        }
