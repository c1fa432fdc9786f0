"""PyTorch-interop layer: reference .pth checkpoint import and the generic
state_dict -> Flax variable mapping (reference train.py:374 /
evaluate.py:421 whole-model checkpoint contract)."""

from jcfszxc_unet_tpu.compat.torch_import import (  # noqa: F401
    import_torch_checkpoint,
    load_pth_state_dict,
    variables_from_state_dict,
)
from jcfszxc_unet_tpu.compat.torch_mapping import (  # noqa: F401
    EXPECTED_UNUSED,
    MappingError,
    state_dict_to_variables,
)
