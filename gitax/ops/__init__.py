from .interp import bicubic_resize_2d, resize_pos_embed_grid
from .quant import (
    quantize_git_params,
    quantize_linear,
    quantize_textual_for_decode,
)
