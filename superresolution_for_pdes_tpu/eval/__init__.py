"""Evaluation & comparison harnesses (the reference's L4/L5 eval suite)."""

from superresolution_for_pdes_tpu.eval.metrics import compute_metrics  # noqa: F401
from superresolution_for_pdes_tpu.eval.single_level import evaluate_dataset  # noqa: F401
from superresolution_for_pdes_tpu.eval.out_of_sample import evaluate_out_of_sample  # noqa: F401
from superresolution_for_pdes_tpu.eval.test_cases import run_generalization_grid  # noqa: F401
from superresolution_for_pdes_tpu.eval.resolution import run_resolution_sweep  # noqa: F401
from superresolution_for_pdes_tpu.eval.statistical import run_statistical_benchmark  # noqa: F401
