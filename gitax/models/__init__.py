from .config import (
    GitConfig,
    ViTConfig,
    MODEL_ZOO,
    VIT_B_16,
    VIT_L_14,
    config_from_param,
)
from .vit import init_vit_params, vit_forward
from .textual import (
    init_textual_params,
    textual_forward,
    project_visual,
    embed_captions,
)
from .git import GitModel
