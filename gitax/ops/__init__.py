from .interp import bicubic_resize_2d, resize_pos_embed_grid
