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
    kFeatureMatchDefaultRatioTest = 0.7     # default matcher ratio (ref :97)
    kMatchRatioTestFrameByProjection = 0.9  # ref :174
    kMatchRatioTestEpipolarLine = 0.8       # ref :176
    kCheckOrientation = True                # rotation-histogram consistency filter
    kCheckFeaturesOrientation = True        # reference alias (ref :102)
    kNumRotHistogramBins = 30               # bins in rotation histogram
    kRotHistogramKeepTopN = 3               # keep matches in top-N bins
    kMinDistanceFromEpipole = 10            # px, search-by-epipolar gate (ref :184)
    kKdtNmsRadius = 3                       # px NMS radius (grid NMS analog, ref :100)

    # ------------------------------------------------------------- tracking
    kUseMotionModel = True
    kMinNumMatchedFeaturesSearchFrameByProjection = 20
    kMaxReprojectionDistanceFrame = 7       # px radius, search prev frame by projection
    kMaxReprojectionDistanceFrameWide = 14  # widened radius on failure
    kMaxReprojectionDistanceMap = 3         # px radius, search map by projection
    kMaxReprojectionDistanceMapRelocalize = 5
    kMaxReprojectionDistanceMapReloc = 5    # reference alias (ref :170)
    kMinTrackedFeaturesForPoseOpt = 10
    kNumMinInliersPoseOptimizationTrackFrame = 10
    kNumMinInliersTrackLocalMap = 30
    kNumMinInliersTrackLocalMapForNotPausingLocalMapping = 50
    kUseSearchFrameByProjection = True
    kMaxNumOfKeyframesInLocalMap = 80
    # fixed TPU-path cap on local-map points per tracking dispatch (padded to
    # exactly this shape every frame => one compile per session; larger local
    # maps are subsampled by observation count — see tracking.track_local_map)
    kTrackLocalMapMaxPoints = 8192
    kNumMinObsForKeyFrameDefault = 3
    kMaxReprojectionDistanceFrameNonStereo = 15  # px (ref :167)
    kMaxReprojectionDistanceMapRgbd = 3     # px (ref :169)
    kMinNumMatchedFeaturesSearchReferenceFrame = 15  # ref :126
    kNumBestCovisibilityKeyFrames = 10      # ref :128
    kMaxOutliersRatioInPoseOptimization = 0.9  # ref :135
    kUseEssentialMatrixFitting = False      # ref :124
    kUseVisualOdometryPoints = True         # temporary VO points (ref :129)
    kMaxNumVisualOdometryPoints = 100       # ref :130
    kMaxNumStereoPointsOnNewKeyframe = 100  # ref :131
    kUseInterruptLocalMapping = True        # tracking may abort an in-flight LBA
    # per-frame wall-clock budget for back-end host slices (step_async):
    # bounds tracking latency while letting the back-end digest a keyframe
    # within ~a frame like the reference's mapping thread
    kLocalMappingHostBudgetMs = 8.0
    kLogKeyFrameDecision = False            # per-frame KF-condition debug log
    kUseDepthEstimatorInFrontEnd = False    # MONOCULAR->RGBD upgrade (ref :415)
    kDepthEstimatorRemoveShadowPointsInFrontEnd = True  # ref :420

    # ---------------------------------------------------------- initializer
    kCosMaxParallaxInitializer = 0.99998    # ref :83
    kInitializerDesiredMedianDepth = 1.0    # scale normalization (ref :107)
    kInitializerMinRatioDepthBaseline = 100  # ref :108
    kInitializerNumMinFeatures = 100        # ref :109
    kInitializerNumMinFeaturesStereo = 500  # ref :110
    kInitializerNumMinTriangulatedPoints = 150   # ref :111
    kInitializerNumMinTriangulatedPointsStereo = 100  # ref :112
    kInitializerFeatureMatchRatioTest = 0.9  # ref :113
    kInitializerNumMinNumPointsForPnPWithDepth = 15  # ref :114
    kInitializerUseCellCoverageCheck = True  # ref :115
    kInitializerUseMinFrameDistanceCheck = True  # ref :116

    # ---------------------------------------------------------- keyframes
    kNumMinPointsForNewKf = 15              # min tracked points to allow a new KF
    kThNewKfRefRatio = 0.9                  # cond: tracked/ref-tracked ratio (mono)
    kThNewKfRefRatioMonocular = 0.9         # reference alias (ref :145)
    kThNewKfRefRatioStereo = 0.75           # stereo variant
    kThNewKfRefRatioNonMonocular = 0.25     # cond2b non-mono (ref :149)
    kNumMaxFramesBetweenKfs = 30            # cond1a: max frames since last KF (~fps)
    kNumMinFramesBetweenKfs = 0             # min frames between KFs
    kThNewKfMinCloseFeaturesRatio = 0.25    # stereo/RGBD close-point condition
    kNumMinClosePointsForNewKf = 100
    kNumMinTrackedClosePointsForNewKfNonMonocular = 100  # ref :143
    kNumMaxNonTrackedClosePointsForNewKfNonMonocular = 70  # ref :144
    kUseFeatureCoverageControlForNewKf = False  # ref :150
    kUseFovCentersBasedKfGeneration = False  # ref :151
    kMaxFovCentersDistanceForKfGeneration = 0.2  # [m] ref :152

    # ------------------------------------------------------- local mapping
    kLocalBAWindowSize = 20                 # covisibility window for LBA (ref :221)
    kKeyframeCullingRedundantObsRatio = 0.9 # cull KF if 90% points redundantly seen
    kKeyframeCullingMinNumPoints = 3
    kKeyframeMaxTimeDistanceInSecForCulling = 0.5  # [s] ref :156
    kMapPointCullingMinFoundRatio = 0.25    # found/visible acceptance for new points
    kNumMinObsForCulling = 3
    kUseLargeWindowBA = False               # periodic large-window BA (ref :222)
    kEveryNumFramesLargeWindowBA = 10       # keyframes between large BAs (ref :225)
    kLargeBAWindowSize = 20
    kLocalMappingNumNeighborKeyFramesStereo = 10    # triangulation neighbors (ref :191)
    kLocalMappingNumNeighborKeyFramesMonocular = 20  # ref :194
    kMinNumOfCovisiblePointsForCreatingConnection = 15  # ref :200
    kMaxReprojectionDistanceFuse = 3        # px (ref :171)
    kMaxDistanceToleranceFactor = 1.2       # scale-invariance distance gates (ref :92)
    kMinDistanceToleranceFactor = 0.8       # ref :93

    # ------------------------------------------------------------ optimizer
    kOptimizerPoseItsRounds = 4             # motion-only: 4 rounds
    kOptimizerPoseItsPerRound = 10          # x 10 LM iterations
    kChi2Mono = 5.991                       # chi-square 2 dof 95%
    kChi2Stereo = 7.815                     # chi-square 3 dof 95%
    # 6 LM iterations in two 3-iteration chunks: each keyframe's window is
    # warm-started from the last one (poses/points barely move between
    # consecutive LBAs), so the marginal error reduction of iterations 7-10
    # is below the triangulation noise floor while their device time
    # (~19 ms/chunk at the padded 56/4096/16384 shape) lands on the single
    # queue in front of every frame's tracking readback.  (reference g2o
    # runs 5+10, but from a COLD graph each time, optimizer_g2o.py:824)
    kOptimizerLBAIterations = 6
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
    kMaxReprojectionDistanceSim3 = 7.5      # px (ref :172)
    kUseEssentialGraphPGO = True
    kUseGBA = True                          # GBA after loop closure (ref :232)
    kGBAUseRobustKernel = True
    kMinDeltaFrameForMeaningfulLoopClosure = 10  # ref :244
    kMaxResultsForLoopClosure = 5           # ref :245
    kLoopClosingFeatureMatchRatioTest = 0.9  # ref :259
    # direct-index gating depth for loop guided matching: pairs must share a
    # vocabulary-tree ancestor ``depth - this`` levels down (reference DBoW
    # di_levels; larger value = coarser gate / more candidate pairs)
    kLoopClosingDirectIndexLevel = 3
    kLoopClosingMaxReprojectionDistanceMapSearch = 10  # px (ref :256)
    kLoopClosingMaxReprojectionDistanceFuse = 4  # px (ref :258)
    kLoopClosingGeometryCheckerMinKpsMatches = 20  # ref :254

    # -------------------------------------------------------- relocalization
    kRelocalizationMinPnPInliers = 15
    kRelocalizationFinalMinNumInliers = 50  # accept relocalization with >=50 inliers
    kRelocalizationPnPRansacIterations = 256
    kMaxLostFramesBeforeReset = 5           # auto-reset if LOST early (ref tracking.py:1424)
    kRelocalizationMinKpsMatches = 15       # ref :267
    kRelocalizationFeatureMatchRatioTest = 0.75  # ref :270
    kRelocalizationFeatureMatchRatioTestLarge = 0.9  # ref :273
    kRelocalizationPoseOpt1MinMatches = 10  # ref :274
    kRelocalizationDoPoseOpt2NumInliers = 50  # ref :275
    kRelocalizationMaxReprojectionDistanceMapSearchCoarse = 10  # px (ref :276)
    kRelocalizationMaxReprojectionDistanceMapSearchFine = 3  # px (ref :277)

    # -------------------------------------------------------------- stereo
    kStereoMatchingRowTolerance = 2.0       # rows tolerance for rectified match
    kStereoMatchingMaxRowDistance = 1.1     # reference alias [px] (ref :160)
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
    # SGM internal resolution divisor for integration-time depth: 2 runs the
    # matcher at half resolution / half disparity range (same metric depth
    # range since disparity scales with fx) for ~8x less device work —
    # depth error stays well under the voxel quantization at 0.1-0.2 m
    kVolumetricIntegrationDepthSGMDownscale = 2
    # voxel-hash table slots: keep load factor <= ~0.25 (the insert claim
    # loop probes at most INSERT_ROUNDS slots; a saturated table silently
    # stops growing — the r2 bench capped at exactly 2^20 voxels this way).
    # 40 B/slot => 2^22 slots = 168 MB HBM, cheap on a 16 GB chip.
    kVolumetricIntegrationTableCapacity = 1 << 22
    # max voxel samples on each side of the measured surface per depth ray:
    # insert cost is linear in pixels x (2*band+1) at ~11 ns/element per
    # random pass, and +-2 voxels brackets the zero crossing; raise this to
    # integrate the full sdf_trunc region when fidelity beats speed
    kVolumetricIntegrationBandMaxSteps = 2
    kDoVolumetricIntegration = False        # reference master switch (ref :300)
    kVolumetricIntegrationType = "TSDF"     # ref :308 (VOXEL_GRID there)
    kVolumetricIntegrationVoxelLength = 0.015   # [m] ref :311
    kVolumetricIntegrationBlockSize = 8     # voxels/block (ref :313)
    kVolumetricIntegrationVoxelGridMinCount = 1   # ref :327
    kVolumetricIntegrationVoxelGridMinConfidence = 0.3  # ref :330
    kVolumetricIntegrationVoxelGridUseCarving = False  # ref :334
    kVolumetricIntegrationVoxelGridCarvingDepthMin = 0.0  # ref :335
    kVolumetricIntegrationVoxelGridCarvingDepthMaxIndoor = 8.0   # ref :338
    kVolumetricIntegrationVoxelGridCarvingDepthMaxOutdoor = 15.0  # ref :339
    kVolumetricIntegrationVoxelGridCarvingDepthThreshold = 3e-2  # [m] ref :340
    kVolumetricIntegrationVoxelGridShadowPointsFilter = True  # ref :342
    kVolumetricIntegrationTsdfExtractMesh = False  # ref :346
    kVolumetricIntegrationTSdfTrunc = 0.04  # [m] ref :349
    kVolumetricIntegrationTsdfDepthTruncIndoor = 4.0   # [m] ref :350
    kVolumetricIntegrationTsdfDepthTruncOutdoor = 10.0  # [m] ref :351
    kVolumetricIntegrationOutputTimeInterval = 1.0  # [s] ref :354
    kVolumetricIntegrationDepthEstimationFilterShadowPoints = True  # ref :362

    # ------------------------------------------------------------ semantics
    kSemanticMappingOnSeparateThread = False
    kSemanticMappingNumClasses = 21
    kDoSparseSemanticMapping = True
    kDoSparseSemanticMappingAndSegmentation = False  # reference alias (ref :385)
    kSemanticSegmentationType = ""          # model override (ref :394)
    kUseSemanticsInOptimization = False     # semantic BA weighting (ref :402)
    kSemanticSegmentationEnforceUniqueInstanceIds = False  # ref :405
    kSemanticSegmentationUniqueInstanceMinPixels = 50  # ref :408
    kVolumetricSemanticProbabilisticIntegrationUseDepth = True  # ref :367
    kVolumetricSemanticProbabilisticIntegrationDepthThresholdIndoor = 5.0   # ref :370
    kVolumetricSemanticProbabilisticIntegrationDepthThresholdOutdoor = 10.0  # ref :371
    kVolumetricSemanticProbabilisticIntegrationDepthDecayRateIndoor = 0.1   # ref :372
    kVolumetricSemanticProbabilisticIntegrationDepthDecayRateOutdoor = 0.05  # ref :375
    kVolumetricSemanticIntegrationUseInstanceIds = False  # ref :376
    kVolumetricSemanticIntegrationMinVoteRatio = 0.5  # ref :379
    kVolumetricSemanticIntegrationMinVotes = 3  # ref :380

    # --------------------------------------------------------------- system
    kLocalMappingOnSeparateThread = False   # TPU build: host scheduler interleave
    kTrackingWaitForLocalMappingToGetIdle = False
    kUseVolumetricIntegration = False
    kUseSemanticMapping = False
    kLogKFinfoToFile = False
    kUseDynamicDesDistanceTh = True         # adaptive descriptor threshold (MAD stats)
    kUseFusedTrackingStep = True            # one-dispatch OK-path tracking (ops/fused_tracking.py)
    # frames in flight on the OK path: 2 = chained pipelining (frame N's
    # tracking graph consumes frame N-1's DEVICE output; the host reads each
    # frame back one call later — ops/fused_tracking.py
    # track_frame_fused_chained).  1 = dispatch + same-frame readback.
    # Default 1: measured on the v5e tunnel (r5 ablations), depth 2 saves
    # only ~8 ms of the ~125 ms frame (extraction prefetch already overlaps
    # at depth 1; the backend device-queue share dominates the readback
    # wait) while it makes the keyframe decision run on one-frame-stale
    # inliers — which lost tracking on fast-decaying streams.  Depth 2
    # remains available and is guarded by an adaptive low-inlier valve
    # (tracking._track_pipelined).
    kTrackingPipelineDepth = 1

    # ---------------------------------------------------------------- TPU
    kDeviceMatchTileSize = 512              # pallas tile for distance kernels
    kUseBfloat16Pyramid = False             # pyramid compute dtype
    kMapPointCapacityInitial = 1 << 15      # initial SoA map-point capacity
    kKeyFrameCapacityInitial = 256          # initial keyframe capacity
    kObsPadPerFrame = 4096                  # padded observations per BA frame

    # ------------------------------------------- reference-compat (no-op)
    # Accepted so reference YAML GLOBAL_PARAMETERS blocks load unchanged;
    # these gate thread/process plumbing, debug-file sinks, or the g2o/GTSAM
    # engine split that the single-process TPU runtime replaces (async device
    # dispatch instead of threads; one Schur-LM core instead of two engines).
    kWaitForLocalMappingTimeout = 0.5
    kParallelLBAWaitIdleTimeout = 1.0
    kUseParallelProcessLBA = False
    kLocalMappingParallelKpsMatching = True
    kLocalMappingParallelKpsMatchingNumWorkers = 2
    kLocalMappingParallelFusePointsNumWorkers = 2
    kLocalMappingDebugAndPrintToFile = False
    kLocalMappingTimeoutPopKeyframe = 0.5
    kLoopClosingParallelKpsMatching = True
    kLoopClosingParallelKpsMatchingNumWorkers = 2
    kLoopClosingDebugAndPrintToFile = False
    kLoopClosingDebugWithLoopDetectionImages = False
    kLoopClosingDebugWithSimmetryMatrix = False
    kLoopClosingDebugWithLoopConsistencyCheckImages = False
    kLoopClosingDebugShowLoopMatchedPoints = False
    kLoopDetectingTimeoutPopKeyframe = 0.5
    kRelocalizationParallelKpsMatching = True
    kRelocalizationParallelKpsMatchingNumWorkers = 2
    kRelocalizationDebugAndPrintToFile = False
    kGBADebugAndPrintToFile = False
    kSemanticMappingMoveSemanticSegmentationToSeparateProcess = False
    kSemanticMappingDebugAndPrintToFile = False
    kSemanticMappingTimeoutPopKeyframe = 0.5
    kVolumetricIntegrationDebugAndPrintToFile = False
    kVolumetricIntegrationUseVoxelBlocks = True
    kVolumetricIntegrationTBBThreads = 4
    kVolumetricIntegrationFpsThrottleEnabled = False
    kVolumetricIntegrationFpsThrottleMinQueueSize = 5
    kVolumetricIntegrationFpsMaxThreshold = 10.0
    kVolumetricIntegrationFpsThrottleBaseDelay = 0.01
    kVolumetricIntegrationFpsThrottleScale = 0.1
    kOptimizationAllUseGtsam = False
    kOptimizationFrontEndUseGtsam = False
    kOptimizationBundleAdjustUseGtsam = False
    kOptimizationLoopClosingUseGtsam = False
    kMultiprocessingProcessJoinDefaultTimeout = 5.0
    kMultithreadingThreadJoinDefaultTimeout = 5.0
    kViewerDrawSlamMapOnSeparateThread = False
    kUseDescriptorSigmaMadv2 = False
    kUseMotionBlurDection = False
    kMotionBlurDetectionLalacianVarianceThreshold = 100.0
    kMotionBlurDetectionMaxNumMatchedKpsToEnablRansacHomography = 30
    kDepthImageUndistortionUseOptimalNewCameraMatrixWithAlphaScale = True
    kDepthImageUndistortionOptimalNewCameraMatrixWithAlphaScaleValue = 0.0
    kDenseMappingDtypeVertices = "float32"
    kDenseMappingDtypeColors = "float32"
    kDenseMappingDtypeDepth = "float32"
    kDenseMappingDtypeSemantics = "int32"
    kDenseMappingDtypeObjectIds = "int32"
    kDenseMappingDtypeTriangles = "uint32"
    kLogsFolder = "logs"
    kStereoMatchingShowMatchedPoints = False
    kMaxFeatureTrailLength = 16
    kSparseImageColorPatchDelta = 1
    kMinWeightForDrawingCovisibilityEdge = 100
    kMaxSparseMapPointsToVisualize = 1e6

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
