"""Parity harness dry-run: synthetic stand-ins exercise the full plumbing."""

import json
import os


def test_parity_harness_synthetic(tmp_path):
    from fluid_llm_tpu.tools.parity_harness import main

    out = tmp_path / "BASELINE_MEASURED.json"
    record = main([
        "--synthetic", "--pred_steps", "6",
        "--synthetic_layers", "2", "--synthetic_resolution", "64",
        "--out", str(out),
    ])
    assert out.exists()
    on_disk = json.loads(out.read_text())
    assert on_disk["synthetic"] is True
    ours = on_disk["ours"]
    assert ours["n_rmse_mean"] > 0 and ours["wall_s"] > 0
    assert len(ours["per_step_head"]) == 6
    # no reference checkout/CUDA in this environment: section stays None and
    # the top-level vs_baseline key (bench.py contract) must stay absent
    assert on_disk["reference"] is None
    assert "rollout_steps_per_sec" not in on_disk
    assert record["ours"]["n_rmse_mean"] == ours["n_rmse_mean"]
