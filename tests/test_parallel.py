"""Data-parallel correctness on the virtual 8-device CPU mesh (the
TPU-world fake backend, SURVEY.md §4): sharded training must compute the
same numbers as single-device, and sharding/placement helpers must behave."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from jcfszxc_unet_tpu.data.sampler import build_train_sample_map
from jcfszxc_unet_tpu.models import create_model
from jcfszxc_unet_tpu.parallel.mesh import (
    batch_sharding,
    make_mesh,
    put_batch_sharded,
    put_replicated,
    shard_batch,
)
from jcfszxc_unet_tpu.train.optim import make_optimizer
from jcfszxc_unet_tpu.train.state import create_train_state
from jcfszxc_unet_tpu.train.trainer import make_epoch_fn, make_val_fn


def _tiny_setup(mesh, steps=2, batch=8, patch=16, augment=False):
    """Small model: TransFuseNet (8/16/32 channels) keeps CPU compile fast
    while exercising BN, CBAM, MHA and transposed-conv blocks."""
    rng = np.random.RandomState(0)
    images = jnp.asarray(rng.rand(2, 48, 48, 3), jnp.float32)
    labels = jnp.asarray((rng.rand(2, 48, 48, 1) > 0.8), jnp.float32)
    smap = jnp.asarray(
        build_train_sample_map(np.ones((2, 48, 48), np.float32), patch // 2)
    )
    model = create_model("RetinaLiteNet.TransFuseNet")
    tx = make_optimizer(1e-3)
    state = create_train_state(
        model, tx, jax.random.PRNGKey(0), jnp.zeros((1, patch, patch, 3))
    )
    if mesh is not None:
        state = state.replace(
            params=put_replicated(state.params, mesh),
            batch_stats=put_replicated(state.batch_stats, mesh),
            opt_state=put_replicated(state.opt_state, mesh),
        )
        images = put_replicated(images, mesh)
        labels = put_replicated(labels, mesh)
        smap = put_replicated(smap, mesh)
    epoch_fn = make_epoch_fn(
        model, tx, n_classes=model.n_classes, batch_size=batch,
        patch_size=patch, steps=steps, mesh=mesh, augment=augment,
    )
    return model, state, epoch_fn, images, labels, smap


class TestDPEquivalence:
    def test_sharded_matches_single_device(self):
        key = jax.random.PRNGKey(42)

        _, s1, e1, im, lb, sm = _tiny_setup(None)
        s1, m1 = e1(s1, im, lb, sm, key)

        mesh = make_mesh(8)
        _, s8, e8, im8, lb8, sm8 = _tiny_setup(mesh)
        s8, m8 = e8(s8, im8, lb8, sm8, key)

        assert abs(float(m1["epoch_loss"]) - float(m8["epoch_loss"])) < 1e-3
        flat1 = jax.tree.leaves(s1.params)
        flat8 = jax.tree.leaves(s8.params)
        for a, b in zip(flat1, flat8):
            # Sharded reductions sum partial means in a different order than
            # the single-device reduction; RMSprop's rsqrt amplifies the
            # ~1e-7 relative difference to ~1e-4 after two steps.  Identical
            # semantics, different float association.
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)

    def test_batch_is_actually_sharded(self):
        mesh = make_mesh(8)
        x = np.zeros((16, 4, 4, 3), np.float32)
        xs = put_batch_sharded(x, mesh)
        shard_shapes = {s.data.shape for s in xs.addressable_shards}
        assert shard_shapes == {(2, 4, 4, 3)}

    def test_val_fn_on_mesh(self):
        mesh = make_mesh(8)
        model, state, _, *_ = _tiny_setup(mesh)
        val_fn = make_val_fn(model, patch_size=16, chunk_size=8, mesh=mesh)
        rng = np.random.RandomState(1)
        vi = put_replicated(jnp.asarray(rng.rand(16, 16, 16, 3), jnp.float32), mesh)
        vl = put_replicated(
            jnp.asarray((rng.rand(16, 16, 16, 1) > 0.8), jnp.float32), mesh
        )
        metrics, probs = val_fn(state.params, state.batch_stats, vi, vl)
        assert probs.shape == (16, 16, 16, 1)
        for k in ("dice", "dice_bg", "dice_fg", "dice_avg"):
            assert np.isfinite(float(metrics[k]))


class TestHelpers:
    def test_mesh_size(self):
        assert make_mesh(8).size == 8
        assert make_mesh(4).size == 4

    def test_shard_batch_noop_without_mesh(self):
        x = jnp.ones((4, 2))
        assert shard_batch(x, None) is x

    def test_batch_sharding_spec(self):
        mesh = make_mesh(8)
        s = batch_sharding(mesh, 4)
        assert s.spec == P("data", None, None, None)


class TestTiledPredictOnMesh:
    def test_sharded_tiles_match_single_device(self):
        from jcfszxc_unet_tpu.eval.tiling import tiled_predict

        rng = np.random.RandomState(5)
        images = jnp.asarray(rng.rand(2, 48, 40, 3), jnp.float32)

        def forward(batch):
            return jnp.mean(batch, axis=-1, keepdims=True)

        base = tiled_predict(forward, images, patch_size=16,
                             inference_batch_size=8)
        mesh = make_mesh(8)
        sharded = tiled_predict(forward, images, patch_size=16,
                                inference_batch_size=8, mesh=mesh)
        np.testing.assert_allclose(np.asarray(base), np.asarray(sharded),
                                   rtol=1e-6, atol=1e-7)


class TestRemat:
    def test_remat_matches_plain(self):
        key = jax.random.PRNGKey(3)
        model, state, _, im, lb, sm = _tiny_setup(None)
        from jcfszxc_unet_tpu.train.trainer import make_epoch_fn as mef

        tx = make_optimizer(1e-3)
        e_plain = mef(model, tx, n_classes=1, batch_size=8, patch_size=16,
                      steps=1)
        e_remat = mef(model, tx, n_classes=1, batch_size=8, patch_size=16,
                      steps=1, remat=True)

        s_a, m_a = e_plain(state, im, lb, sm, key)
        _, state2, _, *_ = _tiny_setup(None)
        s_b, m_b = e_remat(state2, im, lb, sm, key)
        assert abs(float(m_a["epoch_loss"]) - float(m_b["epoch_loss"])) < 1e-5
        for a, b in zip(jax.tree.leaves(s_a.params), jax.tree.leaves(s_b.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


class TestEmptyValidation:
    def test_zero_val_images(self):
        """val_percent that rounds to zero images must not crash (found by
        the hardware CLI run with 6 train images at 10% validation)."""
        model, state, _, *_ = _tiny_setup(None)
        val_fn = make_val_fn(model, patch_size=16, chunk_size=8)
        vi = jnp.zeros((0, 16, 16, 3))
        vl = jnp.zeros((0, 16, 16, 1))
        metrics, probs = val_fn(state.params, state.batch_stats, vi, vl)
        assert float(metrics["dice"]) == 0.0
        assert probs.shape[0] == 0


class TestDPEquivalenceExoticArchetypes:
    """VERDICT r1 item 7: the exotic dataflows — SegNet's one-hot argmax
    pool/unpool routing, BCDU_net_D3's time-stacked ConvLSTM decoder, and
    FRUNet's 17-node grid — must produce single-device numbers when GSPMD
    shards the batch over a mesh.

    Mesh size 2 (not 8): these are full-width models, and on this image's
    ONE physical core eight timesharing device threads cannot all reach
    XLA:CPU's hard-40s collective rendezvous with this much per-shard work
    (experiments_record.md "collective rendezvous flakiness").  Two shards
    exercise the identical GSPMD sharding/all-reduce of the exotic ops."""

    def _run(self, name, mesh, patch=32, **kwargs):
        rng = np.random.RandomState(7)
        images = jnp.asarray(rng.rand(2, 64, 64, 3), jnp.float32)
        labels = jnp.asarray((rng.rand(2, 64, 64, 1) > 0.8), jnp.float32)
        smap = jnp.asarray(
            build_train_sample_map(np.ones((2, 64, 64), np.float32),
                                   patch // 2))
        model = create_model(name, **kwargs)
        # Reference-default lr: RMSprop's first step is ~±10*lr*sign(g), so
        # a large lr turns reduction-order noise on near-zero gradients
        # into ±2e-2 param flips.  At 1e-6 those flips are 2e-5 and real
        # sharding bugs still show up in the loss/batch-stats asserts.
        tx = make_optimizer(1e-6)
        state = create_train_state(
            model, tx, jax.random.PRNGKey(0),
            jnp.zeros((1, patch, patch, 3)))
        if mesh is not None:
            state = state.replace(
                params=put_replicated(state.params, mesh),
                batch_stats=put_replicated(state.batch_stats, mesh),
                opt_state=put_replicated(state.opt_state, mesh),
            )
            images = put_replicated(images, mesh)
            labels = put_replicated(labels, mesh)
            smap = put_replicated(smap, mesh)
        epoch_fn = make_epoch_fn(
            model, tx, n_classes=model.n_classes, batch_size=2,
            patch_size=patch, steps=1, mesh=mesh)
        state, metrics = epoch_fn(state, images, labels, smap,
                                  jax.random.PRNGKey(9))
        return state, metrics

    def _check(self, name, **kwargs):
        s1, m1 = self._run(name, None, **kwargs)
        s8, m8 = self._run(name, make_mesh(2), **kwargs)
        assert np.isfinite(float(m1["epoch_loss"]))
        assert abs(float(m1["epoch_loss"]) - float(m8["epoch_loss"])) < 1e-5
        # batch_stats are the sharpest forward-correctness signal: every
        # layer's batch mean/var must match across shardings (no optimizer
        # in the path).
        for (pa, a), (pb, b) in zip(
                jax.tree_util.tree_leaves_with_path(s1.batch_stats),
                jax.tree_util.tree_leaves_with_path(s8.batch_stats)):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6,
                                       err_msg=jax.tree_util.keystr(pa))
        for a, b in zip(jax.tree.leaves(s1.params),
                        jax.tree.leaves(s8.params)):
            # updates are ~±1e-5; sign flips on noise-gradient elements
            # give 2e-5 — covered by atol 5e-5.
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-3, atol=5e-5)

    def test_segnet_index_routing_on_mesh(self):
        self._check("SegNet.SegNet")

    def test_bcdu_d3_convlstm_on_mesh(self):
        self._check("BCDUNet.BCDU_net_D3", N=32)

    def test_frunet_grid_on_mesh(self):
        self._check("FRUNet.FRUNet")

    def test_multiresunet_s2d_on_mesh(self):
        """s2d residency under GSPMD: the pack/unpack reshapes and the
        phase-grouped BN reductions are batch-pointwise, so the sharded
        step must reproduce single-device numbers like any other model."""
        self._check("MultiResUNet.MultiResUNet", s2d=True)


class TestSpatialPartitioning:
    """SURVEY §2.5 item 3 (stretch): whole-image inference with the ROW
    axis sharded across the mesh — GSPMD partitions the convs spatially
    and inserts the halo exchanges.  Must reproduce single-device numbers
    (same math, different partitioning)."""

    def test_whole_image_spatial_matches_single_device(self):
        from jcfszxc_unet_tpu.parallel.spatial import make_spatial_forward

        model = create_model("RetinaLiteNet.TransFuseNet")
        rng = np.random.RandomState(2)
        images = jnp.asarray(rng.rand(2, 40, 48, 3), jnp.float32)
        v = jax.jit(lambda r, x: model.init(r, x, True))(
            jax.random.PRNGKey(0), jnp.zeros((1, 16, 16, 3)))
        variables = {"params": v["params"],
                     "batch_stats": v.get("batch_stats", {})}

        mesh = make_mesh(4)
        fwd_sp = make_spatial_forward(model, variables, mesh, divisor=8)
        got = np.asarray(fwd_sp(images))

        # single-device oracle with identical padding
        from jcfszxc_unet_tpu.parallel.spatial import pad_to_multiple
        x, oh = pad_to_multiple(images, 1, 4 * 8)
        x, ow = pad_to_multiple(x, 2, 8)
        want = jax.nn.sigmoid(
            model.apply(variables, x, train=False).astype(jnp.float32))
        want = np.asarray(want)[:, :40, :48, 0]

        assert got.shape == (2, 40, 48)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    def _check_spatial(self, name, h, w, divisor, n_mesh=2, tol=1e-5,
                       **kwargs):
        """Spatial partitioning vs a single-device oracle with identical
        padding, for models whose dataflow stresses GSPMD differently."""
        from jcfszxc_unet_tpu.parallel.spatial import (
            make_spatial_forward,
            pad_to_multiple,
        )

        model = create_model(name, **kwargs)
        rng = np.random.RandomState(4)
        images = jnp.asarray(rng.rand(1, h, w, 3), jnp.float32)
        v = jax.jit(lambda r, x: model.init(r, x, True))(
            jax.random.PRNGKey(1),
            jnp.zeros((1, divisor, divisor, 3)))
        variables = {"params": v["params"],
                     "batch_stats": v.get("batch_stats", {})}

        mesh = make_mesh(n_mesh)
        fwd_sp = make_spatial_forward(model, variables, mesh,
                                      divisor=divisor)
        got = np.asarray(fwd_sp(images))

        x, _ = pad_to_multiple(images, 1, n_mesh * divisor)
        x, _ = pad_to_multiple(x, 2, divisor)
        want = jax.nn.sigmoid(
            model.apply(variables, x, train=False).astype(jnp.float32))
        want = np.asarray(want)[:, :h, :w, 0]
        assert got.shape == (1, h, w)
        np.testing.assert_allclose(got, want, rtol=tol, atol=1e-5)

    def test_spatial_segnet_divisor32(self):
        """SegNet under SP: 5 pooling levels demand H,W % 32 == 0 after
        padding, and the argmax pool/unpool index routing must survive
        spatial partitioning (window-local argmax never crosses the halo)."""
        self._check_spatial("SegNet.SegNet", h=40, w=64, divisor=32)

    def test_spatial_frunet_grid(self):
        """FRUNet under SP: the 17-node full-resolution grid exchanges
        up/down branches at every scale — the densest halo-exchange
        pattern in the zoo."""
        self._check_spatial("FRUNet.FRUNet", h=24, w=32, divisor=16)

    def test_spatial_bcdu_convlstm(self):
        """BCDU_net_D3 under SP — the round-4 VERDICT's one per-model
        capability asymmetry, lifted.  The reference ctor pins the input
        size N (BCDUNet.py:15, ConvLSTM reshapes); our ConvLSTM2D takes
        every spatial dim from the input (ops/blocks.py ConvLSTM2D), so
        the whole-image forward is size-polymorphic and the time-stacked
        gate convs partition spatially like any conv.  BCDU's own output
        sigmoid composes with the eval sigmoid exactly as on the tiled
        path (double-squash parity, BCDUNet.py:144 + train.py:264)."""
        self._check_spatial("BCDUNet.BCDU_net_D3", h=24, w=32, divisor=8,
                            N=24)


class TestMeshHelpers:
    def test_make_2d_mesh_axes_and_sharding(self):
        """(data, model) mesh: DP x TP forward-compat helper — a batch
        sharding over its data axis must reproduce replicated math."""
        from jcfszxc_unet_tpu.parallel.mesh import batch_sharding, make_2d_mesh

        mesh = make_2d_mesh(4, 2)
        assert mesh.axis_names == ("data", "model")
        assert mesh.devices.shape == (4, 2)

        x = jnp.arange(8 * 3, dtype=jnp.float32).reshape(8, 3)
        xs = jax.device_put(x, batch_sharding(mesh, x.ndim))
        got = jax.jit(lambda a: (a * 2).sum())(xs)
        np.testing.assert_allclose(float(got), float((x * 2).sum()))

    def test_initialize_distributed_noop_single_process(self):
        """No coordinator/env -> returns without touching jax.distributed
        (the single-process common case)."""
        from jcfszxc_unet_tpu.parallel.mesh import initialize_distributed

        assert initialize_distributed() is None


class TestAugmentUnderDP:
    def test_augmented_sharded_matches_single_device(self):
        """--augment composes with GSPMD batch sharding: the per-sample
        dihedral selects shard along the batch axis like everything else,
        so the 8-device trajectory must reproduce single-device numbers."""
        key = jax.random.PRNGKey(11)

        _, s1, e1, im, lb, sm = _tiny_setup(None, augment=True)
        s1, m1 = e1(s1, im, lb, sm, key)

        mesh = make_mesh(8)
        _, s8, e8, im8, lb8, sm8 = _tiny_setup(mesh, augment=True)
        s8, m8 = e8(s8, im8, lb8, sm8, key)

        assert abs(float(m1["epoch_loss"]) - float(m8["epoch_loss"])) < 1e-3
        for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s8.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=2e-3, atol=1e-5)
