"""Precise-BN recalibration (``make_precise_bn_fn`` / ``--precise-bn``).

Additive capability (not in the reference): re-estimate BN running
statistics as the mean of PURE per-batch statistics over K fresh batches,
recovered algebraically from the torch-convention EMA update
``running <- (1-m)*base + m*batch`` (m=0.1 for every BN in the zoo).
Motivation and hardware evidence: experiments_record.md round 3 — at
production learning rates the EMA lags activation drift badly enough on
SegNet/MultiResUNet that eval-mode logits saturate while train-mode
learns, reproduced with the reference's own torch modules
(scripts/torch_bn_lag.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from jcfszxc_unet_tpu.data.sampler import (
    build_train_sample_map,
    sample_batch,
)
from jcfszxc_unet_tpu.models import create_model
from jcfszxc_unet_tpu.train.trainer import make_precise_bn_fn

PATCH = 16
BATCH = 4
K = 3


def _setup(seed=0):
    rng = np.random.RandomState(seed)
    images = jnp.asarray(rng.rand(2, 48, 48, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, 48, 48, 1) > 0.8), jnp.float32)
    smap = jnp.asarray(
        build_train_sample_map(np.ones((2, 48, 48), np.float32), PATCH // 2)
    )
    model = create_model("MCUNet.MCUNet")
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "dropout": jax.random.PRNGKey(2)},
        jnp.zeros((1, PATCH, PATCH, 3)), train=False,
    )
    return model, variables, images, labels, smap


def test_precise_bn_equals_mean_of_pure_batch_stats():
    """fn output == mean over K batches of (S_i - 0.9*base)/0.1 where S_i
    is the EMA tree one train-mode apply produces — i.e. the mean of the
    pure batch statistics, with the same sampling stream."""
    model, variables, images, labels, smap = _setup()
    params, base = variables["params"], variables["batch_stats"]

    fn = make_precise_bn_fn(
        model, batch_size=BATCH, patch_size=PATCH, k_batches=K,
    )
    key = jax.random.PRNGKey(7)
    got = fn(params, base, images, labels, smap, key)

    # Replicate: same key split protocol as the scan body.
    acc = None
    for k in jax.random.split(key, K):
        k_sample, k_drop = jax.random.split(k)
        imgs, _ = sample_batch(k_sample, images, labels, smap, BATCH, PATCH)
        _, mut = model.apply(
            {"params": params, "batch_stats": base},
            imgs, train=True, mutable=["batch_stats"],
            rngs={"dropout": k_drop},
        )
        pure = jax.tree.map(
            lambda s, b: (s - 0.9 * b) / 0.1, mut["batch_stats"], base
        )
        acc = pure if acc is None else jax.tree.map(jnp.add, acc, pure)
    want = jax.tree.map(lambda a: a / K, acc)

    flat_got = jax.tree_util.tree_leaves(got)
    flat_want = jax.tree_util.tree_leaves(want)
    assert flat_got and len(flat_got) == len(flat_want)
    for g, w in zip(flat_got, flat_want):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=2e-4, atol=2e-5
        )


def test_precise_bn_is_independent_of_stale_base():
    """The recalibrated stats are PURE batch statistics: running the pass
    from a wildly stale base tree (the situation that motivates the flag)
    must give the same result as from the fresh base.  The train-mode
    forward normalizes with batch statistics, so the whole tree is
    base-independent up to the f32 cancellation in the EMA inversion —
    which is exactly why the recalibration rescues a model whose EMA has
    drifted away from its activations."""
    model, variables, images, labels, smap = _setup()
    params, base = variables["params"], variables["batch_stats"]
    stale = jax.tree.map(lambda x: x + 37.0, base)

    fn = make_precise_bn_fn(
        model, batch_size=BATCH, patch_size=PATCH, k_batches=2,
    )
    key = jax.random.PRNGKey(0)
    fresh_out = fn(params, base, images, labels, smap, key)
    stale_out = fn(params, stale, images, labels, smap, key)

    for g, w in zip(jax.tree_util.tree_leaves(stale_out),
                    jax.tree_util.tree_leaves(fresh_out)):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(w), rtol=1e-3, atol=2e-4
        )


def test_no_bn_layers_is_identity():
    """A model with an empty batch_stats tree passes through unchanged
    (guard branch in make_precise_bn_fn)."""
    model, variables, images, labels, smap = _setup()
    fn = make_precise_bn_fn(
        model, batch_size=BATCH, patch_size=PATCH, k_batches=K,
    )
    empty = {}
    out = fn(variables["params"], empty, images, labels, smap,
             jax.random.PRNGKey(0))
    assert out == {}


def test_cli_flag_smoke(tmp_path):
    """--precise-bn K runs end-to-end through the train CLI."""
    import h5py

    from jcfszxc_unet_tpu.cli import train as train_cli

    rng = np.random.RandomState(0)
    h5 = tmp_path / "train.h5"
    with h5py.File(h5, "w") as f:
        f.create_dataset("images", data=rng.rand(3, 48, 48, 3).astype("f4"))
        f.create_dataset("masks", data=np.ones((3, 48, 48), "f4"))
        f.create_dataset(
            "labels", data=(rng.rand(3, 48, 48) > 0.8).astype("f4"))
        f.create_dataset(
            "filenames",
            data=np.array([b"a.tif", b"b.tif", b"c.tif"]))
    import os
    cwd = os.getcwd()
    os.chdir(tmp_path)
    try:
        train_cli.main([
            "-d", str(h5), "-b", "4", "-p", "16", "-s", "2", "-v", "34",
            "--max-epochs", "1", "--dtype", "float32",
            "--precise-bn", "2",
            "--save-path", str(tmp_path / "best.ckpt"),
        ])
    finally:
        os.chdir(cwd)
