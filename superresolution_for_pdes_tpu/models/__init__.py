"""Model zoo: the attention U-Net super-resolver and weight import utilities."""

from superresolution_for_pdes_tpu.models.unet import (  # noqa: F401
    AttentionGate,
    AttentionUNet,
    ConvBlock,
    count_parameters,
    init_unet,
)
from superresolution_for_pdes_tpu.models.resnet import PDEResNet  # noqa: F401
from superresolution_for_pdes_tpu.models.registry import (  # noqa: F401
    available_models,
    build_model,
)
