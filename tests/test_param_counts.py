"""Parameter-count regression: locks every model's architecture.

Counts are computed via jax.eval_shape (no compute).  The UNet number
(31,037,633) matches the canonical PyTorch transposed-conv UNet exactly,
and AttentionUNet (34,878,573) / SegNet (29,443,585) match their commonly
published PyTorch counts — independent evidence the architectures are
faithful to the reference's.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jcfszxc_unet_tpu.models import create_model

GOLDEN = {
    "UNet.UNet": 31_037_633,
    "AttentionUNet.AttentionUNet": 34_878_573,
    "R2UNet.R2UNet": 39_091_393,
    "R2AttentionUNet.R2AttentionUNet": 39_442_925,
    "BARUNet.BARUNet": 35_525_037,
    "BIARUNet.BIARUNet": 35_568_557,
    "DenseUNet.DenseUNet": 7_553_153,
    "MCUNet.MCUNet": 3_293_133,
    "ResUNet.ResUNet": 13_043_009,
    "FRUNet.FRUNet": 5_720_837,
    "MultiResUNet.MultiResUNet": 7_251_322,
    "SegNet.SegNet": 29_443_585,
    "BCDUNet.BCDU_net_D3": 20_659_973,
    "BCDUNet.BCDU_net_D1": 8_861_445,
    "RetinaLiteNet.TransFuseNet": 53_128,
    "UNetPP.NestedUNet": 9_163_329,
}


@pytest.mark.parametrize("name,count", sorted(GOLDEN.items()))
def test_param_count(name, count):
    kwargs = {"N": 64} if name.startswith("BCDUNet.") else {}
    model = create_model(name, **kwargs)
    x = jnp.zeros((1, 64, 64, 3))
    shapes = jax.eval_shape(
        lambda k: model.init({"params": k}, x, train=False),
        jax.random.PRNGKey(0),
    )
    n = sum(int(np.prod(s.shape)) for s in jax.tree.leaves(shapes["params"]))
    assert n == count, f"{name}: {n:,} != golden {count:,}"
