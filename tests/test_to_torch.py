"""Roundtrip: torch ckpt -> flax -> torch ckpt must be exact, and the
regenerated state dict must load into the torch oracle strictly."""
import numpy as np
import torch

from some_tpu.compat.to_torch import backbone_to_torch_state_dict
from some_tpu.compat.torch_ckpt import convert_backbone_state_dict
from tests.torch_oracle import OracleModel

LAY, DIM, INDIM, OUTDIM, HEADS, HEAD_DIM, KS = 2, 32, 16, 24, 2, 16, 7


def test_roundtrip_exact():
    torch.manual_seed(21)
    model = OracleModel(LAY, DIM, INDIM, OUTDIM, kernel_size=KS,
                        heads=HEADS, dim_head=HEAD_DIM)
    with torch.no_grad():
        for m in model.modules():
            if isinstance(m, torch.nn.BatchNorm1d):
                m.running_mean.normal_()
                m.running_var.uniform_(0.5, 2.0)
    original = {k: v.detach().numpy().astype(np.float32)
                for k, v in model.state_dict().items()}

    variables = convert_backbone_state_dict(original)
    regenerated = backbone_to_torch_state_dict(
        variables["params"], variables["batch_stats"])

    for key, value in original.items():
        if key.endswith("num_batches_tracked"):
            continue
        assert key in regenerated, key
        np.testing.assert_array_equal(regenerated[key], value, err_msg=key)

    # strict load into a fresh torch model
    fresh = OracleModel(LAY, DIM, INDIM, OUTDIM, kernel_size=KS,
                        heads=HEADS, dim_head=HEAD_DIM)
    tensors = {k: torch.from_numpy(np.ascontiguousarray(v))
               for k, v in regenerated.items()}
    missing, unexpected = fresh.load_state_dict(tensors, strict=False)
    assert not unexpected
    assert all(k.endswith("num_batches_tracked") for k in missing) or not missing
