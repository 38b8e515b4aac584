"""Data layer: on-device generators, normalization, splits, npz io.

TPU-native replacement for the reference's L1 data layer
(``/root/reference/src/data_generation.py``,
``src/enhanced_data_generation.py``, ``src/models.py:132-207`` — see
SURVEY.md C2/C3/C7).
"""

from superresolution_for_pdes_tpu.data.generate import (  # noqa: F401
    combine_datasets,
    generate_cascade_dataset,
    generate_enhanced_dataset,
    generate_standard_dataset,
    generate_subdomain_dataset,
    generate_test_dataset,
    selffeed_cascade_dataset,
)
from superresolution_for_pdes_tpu.data.io import (  # noqa: F401
    load_dataset,
    save_dataset,
)
from superresolution_for_pdes_tpu.data.normalization import (  # noqa: F401
    THETA_CONSTANT_TOL,
    NormStats,
    make_model_inputs,
    make_targets,
    per_sample_stats,
)
from superresolution_for_pdes_tpu.data.pipeline import (  # noqa: F401
    epoch_batch_indices,
    stratified_split,
)
