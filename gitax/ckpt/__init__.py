from .torch_convert import (
    convert_git_state_dict,
    convert_vit_state_dict,
    convert_textual_state_dict,
    align_by_suffix,
    load_torch_checkpoint,
)
