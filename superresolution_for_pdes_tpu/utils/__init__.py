"""Shared utilities: run directories, timers, error metrics."""

from superresolution_for_pdes_tpu.utils.runs import create_run_dir, find_latest_run_dir  # noqa: F401
