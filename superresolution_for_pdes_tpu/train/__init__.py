"""Training runtime: jit/pjit loops, schedulers, checkpoints, metrics."""

from superresolution_for_pdes_tpu.train.config import TrainConfig  # noqa: F401
from superresolution_for_pdes_tpu.train.loop import TrainState, train_model  # noqa: F401
from superresolution_for_pdes_tpu.train.schedule import (  # noqa: F401
    EarlyStopping,
    ReduceLROnPlateau,
)
