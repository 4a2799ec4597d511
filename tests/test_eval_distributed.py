"""Multi-chip batch evaluation: one sequence per device (SURVEY §2.13).

The reference's evaluation manager runs N independent headless subprocesses
(``slam_evaluation_manager.py:314``); the TPU mapping is one-sequence-per-
chip with host aggregation and no collectives.  On the test's virtual
8-device CPU mesh, ``run_distributed`` must produce results identical to
the serial deterministic path.
"""

import numpy as np

import jax

from pyslam_tpu.evaluation.manager import EvalConfig, SlamEvaluationManager
from pyslam_tpu.features.tracker import FeatureTrackerConfig


def _grid(n_seqs: int):
    # distinct synthetic sequences: vary the trajectory step so every cell
    # is a different problem
    return [
        {
            "type": "synthetic",
            "name": f"seq{k}",
            "num_frames": 10,
            "sensor_type": "stereo",
            "trajectory": "line",
            "step": 0.3 + 0.02 * k,
        }
        for k in range(n_seqs)
    ]


def _run(tmp_path, distributed: bool):
    cfg = EvalConfig(
        datasets=_grid(8),
        presets={"orb2": FeatureTrackerConfig(num_features=300, num_levels=4)},
        runs_per_dataset=1,
        loop_detector=None,
    )
    mgr = SlamEvaluationManager(
        cfg, out_dir=str(tmp_path / ("dist" if distributed else "serial"))
    )
    if distributed:
        mgr.run_distributed(devices=jax.devices())
    else:
        for ds in cfg.datasets:
            for pn, tc in cfg.presets.items():
                mgr.results.append(
                    mgr._single_run(ds, pn, tc, 0, deterministic=True)
                )
        mgr.write_reports()
    return {r.dataset: r for r in mgr.results}


def test_distributed_eval_matches_serial(tmp_path):
    assert len(jax.devices()) >= 8, "conftest must provide the 8-device mesh"
    serial = _run(tmp_path, distributed=False)
    dist = _run(tmp_path, distributed=True)
    assert set(serial) == set(dist) and len(serial) == 8
    for name in serial:
        a, b = serial[name], dist[name]
        assert np.isclose(a.ate_rmse, b.ate_rmse, rtol=0, atol=1e-12), (
            f"{name}: serial ate {a.ate_rmse} != distributed {b.ate_rmse}"
        )
        assert a.num_keyframes == b.num_keyframes
        assert a.num_points == b.num_points
        assert a.percent_lost == b.percent_lost
    # reports written for the distributed run
    assert (tmp_path / "dist" / "table_rmse.csv").exists()
