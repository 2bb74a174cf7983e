from .torch_convert import (
    convert_git_state_dict,
    convert_vit_state_dict,
    convert_textual_state_dict,
    export_git_state_dict,
    infer_visual_config,
    load_clip_visual,
    align_by_suffix,
    load_torch_checkpoint,
)
from .clip_archive import (
    CLIP_ARCHIVE_SHA256,
    load_clip_archive,
    load_image_encoder_from_archive,
    resolve_archive,
)
from .serialization import (
    save_params,
    restore_params,
    save_train_state,
    restore_train_state,
    latest_step,
)


def save_reference_checkpoint(path, params, cfg):
    """Write a reference-layout torch checkpoint ({'model': state_dict})
    so gitax-trained weights run in the PyTorch reference."""
    import os

    import torch

    from .torch_convert import export_git_state_dict

    sd = {
        k: torch.from_numpy(v) for k, v in export_git_state_dict(params, cfg).items()
    }
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    torch.save({"model": sd}, path)
    return path
