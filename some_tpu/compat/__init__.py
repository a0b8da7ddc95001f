from some_tpu.compat.torch_ckpt import (  # noqa: F401
    convert_backbone_state_dict, load_torch_checkpoint,
)
