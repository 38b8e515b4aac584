"""CLI smoke tests (subcommand dispatch + datagen end-to-end)."""

import json
import subprocess
import sys

import pytest
import os

import numpy as np


def _run(args, cwd=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "superresolution_for_pdes_tpu", *args],
        capture_output=True, text=True, env=env, cwd=cwd,
    )


def test_dispatcher_help():
    out = _run(["--help"])
    assert out.returncode == 0
    assert "resolution_comparison" in out.stdout


def test_dispatcher_unknown():
    out = _run(["frobnicate"])
    assert out.returncode == 2


def test_generate_data_cli(tmp_path):
    out = _run(
        ["generate_data", "--n_standard", "4", "--n_subdomain", "4",
         "--out", str(tmp_path / "ds.npz")]
    )
    assert out.returncode == 0, out.stderr
    data = np.load(tmp_path / "ds.npz")
    assert data["u_fine"].shape == (8, 40, 40)
    assert data["is_subdomain"].sum() == 4


@pytest.mark.slow
def test_train_cli_generate_on_device(tmp_path):
    """train --generate builds its dataset on-device (no npz) and trains."""
    out = _run(
        ["train", "--generate", "--gen_standard", "12", "--gen_subdomain", "4",
         "--gen_theta", "mixed", "--epochs", "2", "--batch_size", "8",
         "--results", str(tmp_path)]
    )
    assert out.returncode == 0, out.stderr
    assert "generated 32 samples on-device" in out.stdout
    run_dir = next(tmp_path.glob("enhanced_run_*"))
    cfg = json.loads((run_dir / "config.json").read_text())
    assert cfg["num_epochs"] == 2
    assert (run_dir / "final_model").exists()
