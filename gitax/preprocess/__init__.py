from .transforms import (
    CLIP_MEAN,
    CLIP_STD,
    TestTransform,
    get_image_transform,
    min_max_resize_size,
)
