"""Space-to-depth execution space (ops/s2d.py): exact parity with the
plain formulation for every op the narrow-channel trunk needs — the
correctness half of the slow-tail candidate measured by
scripts/tpu_s2d_block_probe.py."""

import numpy as np

import jax
import jax.numpy as jnp

from jcfszxc_unet_tpu.ops.s2d import (
    avgpool_exit,
    bn_stats,
    conv_s2d,
    depth_to_space,
    expand_vector,
    maxpool_exit,
    s2d_kernel,
    space_to_depth,
)


def _conv(x, w):
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))


class TestTransform:
    def test_roundtrip_identity(self):
        x = jnp.asarray(np.random.RandomState(0).rand(2, 6, 8, 5), jnp.float32)
        np.testing.assert_array_equal(
            np.asarray(depth_to_space(space_to_depth(x))), np.asarray(x))

    def test_phase_layout_is_c_major(self):
        # s2d channel index c*4 + (a*2+b): phases of one original channel
        # are adjacent, so channel-concat is native in s2d space.
        x = np.zeros((1, 2, 2, 3), np.float32)
        x[0, 1, 0, 2] = 7.0  # channel 2, phase a=1,b=0 -> index 2*4+2
        s = np.asarray(space_to_depth(jnp.asarray(x)))
        assert s[0, 0, 0, 10] == 7.0
        assert s.sum() == 7.0

    def test_concat_is_native(self):
        rng = np.random.RandomState(1)
        a = jnp.asarray(rng.rand(2, 4, 6, 3), jnp.float32)
        b = jnp.asarray(rng.rand(2, 4, 6, 5), jnp.float32)
        lhs = space_to_depth(jnp.concatenate([a, b], axis=-1))
        rhs = jnp.concatenate([space_to_depth(a), space_to_depth(b)], axis=-1)
        np.testing.assert_array_equal(np.asarray(lhs), np.asarray(rhs))

    def test_odd_size_raises(self):
        x = jnp.zeros((1, 3, 4, 2))
        try:
            space_to_depth(x)
            assert False, "expected ValueError"
        except ValueError:
            pass


class TestConvParity:
    def _check(self, k, cin, cout, h=8, w=10, seed=0):
        rng = np.random.RandomState(seed)
        x = jnp.asarray(rng.randn(2, h, w, cin), jnp.float32)
        wt = jnp.asarray(rng.randn(k, k, cin, cout) * 0.3, jnp.float32)
        ref = _conv(x, wt)
        got = depth_to_space(conv_s2d(space_to_depth(x), s2d_kernel(wt)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_conv3x3(self):
        self._check(3, 5, 7)

    def test_conv1x1(self):
        self._check(1, 6, 4)

    def test_conv5x5(self):
        self._check(5, 3, 8)

    def test_conv3x3_dilation2(self):
        # FeatureFuse's dilated branch: even tap offsets collapse to a
        # dilation-1 s2d conv (phase-preserving taps)
        rng = np.random.RandomState(9)
        x = jnp.asarray(rng.randn(2, 10, 12, 4), jnp.float32)
        wt = jnp.asarray(rng.randn(3, 3, 4, 6) * 0.3, jnp.float32)
        ref = jax.lax.conv_general_dilated(
            x, wt, (1, 1), [(2, 2), (2, 2)], rhs_dilation=(2, 2),
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        got = depth_to_space(conv_s2d(space_to_depth(x), s2d_kernel(wt, 2)))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_conv3x3_narrow_tail_geometry(self):
        # multiresblock9's actual widths (64 -> 8), tiny spatial extent
        self._check(3, 64, 8, h=8, w=8, seed=3)

    def test_bias(self):
        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(1, 6, 6, 3), jnp.float32)
        wt = jnp.asarray(rng.randn(3, 3, 3, 5) * 0.3, jnp.float32)
        bias = jnp.asarray(rng.randn(5), jnp.float32)
        ref = _conv(x, wt) + bias
        got = depth_to_space(
            conv_s2d(space_to_depth(x), s2d_kernel(wt)) + expand_vector(bias))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)

    def test_grad_flows_to_original_weights(self):
        rng = np.random.RandomState(4)
        x = jnp.asarray(rng.randn(1, 4, 4, 2), jnp.float32)

        def loss_plain(wt):
            return (_conv(x, wt) ** 2).mean()

        def loss_s2d(wt):
            return (conv_s2d(space_to_depth(x), s2d_kernel(wt)) ** 2).mean()

        wt = jnp.asarray(rng.randn(3, 3, 2, 3) * 0.3, jnp.float32)
        g1 = jax.grad(loss_plain)(wt)
        g2 = jax.grad(loss_s2d)(wt)
        # mean over 4x fewer elements in s2d space scales the loss by 1
        # (same element count overall), so gradients agree exactly.
        np.testing.assert_allclose(np.asarray(g2), np.asarray(g1),
                                   rtol=1e-5, atol=1e-6)


class TestBNAndPool:
    def test_bn_stats_match_plain(self):
        rng = np.random.RandomState(5)
        x = jnp.asarray(rng.randn(3, 8, 6, 7) * 2 + 1, jnp.float32)
        xf = np.asarray(x, np.float64)
        mean, var = bn_stats(space_to_depth(x))
        np.testing.assert_allclose(np.asarray(mean),
                                   xf.mean(axis=(0, 1, 2)),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(var),
                                   xf.var(axis=(0, 1, 2)),
                                   rtol=1e-4, atol=1e-5)

    def test_maxpool_exit(self):
        rng = np.random.RandomState(6)
        x = jnp.asarray(rng.randn(2, 8, 6, 3), jnp.float32)
        from jcfszxc_unet_tpu.ops.layers import max_pool2d
        ref = max_pool2d(x, 2)
        got = maxpool_exit(space_to_depth(x))
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))

    def test_upsample_bilinear_s2d(self):
        from jcfszxc_unet_tpu.ops.layers import upsample_bilinear
        from jcfszxc_unet_tpu.ops.s2d import upsample_bilinear_s2d

        rng = np.random.RandomState(15)
        x = jnp.asarray(rng.randn(2, 5, 7, 3), jnp.float32)
        for align in (True, False):
            ref = space_to_depth(upsample_bilinear(x, 2, align_corners=align))
            got = upsample_bilinear_s2d(x, align_corners=align)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6)

        # from_s2d: s2d-in, s2d-out, nothing unpacked in between
        x = jnp.asarray(rng.randn(2, 6, 8, 3), jnp.float32)
        for align in (True, False):
            ref = space_to_depth(upsample_bilinear(x, 2, align_corners=align))
            got = upsample_bilinear_s2d(space_to_depth(x),
                                        align_corners=align, from_s2d=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-5, atol=1e-6)

        # whole-image sizes route through the gather-form guard (same
        # BILINEAR_MATMUL_MAX_IN cap as the plain path) — still exact
        x = jnp.asarray(rng.randn(1, 292, 4, 2), jnp.float32)
        ref = space_to_depth(upsample_bilinear(x, 2, align_corners=True))
        got = upsample_bilinear_s2d(x)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6)

    def test_avgpool_exit(self):
        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.randn(2, 4, 4, 2), jnp.float32)
        from jcfszxc_unet_tpu.ops.layers import avg_pool2d
        ref = avg_pool2d(x, 2)
        got = avgpool_exit(space_to_depth(x))
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-6, atol=1e-6)


class TestFullBlockParity:
    def test_multiresblock_composite(self):
        """The full m9-style composite (3 chained conv+BN+ReLU, 1x1
        shortcut+BN, concat, add, BN) computed plain vs entirely in s2d
        space must agree — the exact math the hardware probe times."""
        rng = np.random.RandomState(8)
        cin, f3, f5, f7 = 16, 3, 5, 7
        out_f = f3 + f5 + f7
        x = jnp.asarray(rng.randn(2, 8, 8, cin), jnp.float32)
        ws = {
            "w1": jnp.asarray(rng.randn(3, 3, cin, f3) * 0.2, jnp.float32),
            "w2": jnp.asarray(rng.randn(3, 3, f3, f5) * 0.2, jnp.float32),
            "w3": jnp.asarray(rng.randn(3, 3, f5, f7) * 0.2, jnp.float32),
            "wsc": jnp.asarray(rng.randn(1, 1, cin, out_f) * 0.2, jnp.float32),
        }
        gammas = {c: jnp.asarray(rng.rand(n) + 0.5, jnp.float32)
                  for c, n in [("g1", f3), ("g2", f5), ("g3", f7),
                               ("gs", out_f), ("gc", out_f)]}
        betas = {c: jnp.asarray(rng.randn(n) * 0.1, jnp.float32)
                 for c, n in [("b1", f3), ("b2", f5), ("b3", f7),
                              ("bs", out_f), ("bc", out_f)]}

        def bn_plain(h, g, b):
            mu = h.mean(axis=(0, 1, 2))
            var = jnp.maximum((h * h).mean(axis=(0, 1, 2)) - mu * mu, 0.0)
            return (h - mu) * jax.lax.rsqrt(var + 1e-5) * g + b

        def plain(x):
            a = jnp.maximum(bn_plain(_conv(x, ws["w1"]),
                                     gammas["g1"], betas["b1"]), 0)
            b = jnp.maximum(bn_plain(_conv(a, ws["w2"]),
                                     gammas["g2"], betas["b2"]), 0)
            c = jnp.maximum(bn_plain(_conv(b, ws["w3"]),
                                     gammas["g3"], betas["b3"]), 0)
            cat = jnp.concatenate([a, b, c], axis=-1)
            sc = bn_plain(_conv(x, ws["wsc"]), gammas["gs"], betas["bs"])
            return bn_plain(jnp.maximum(cat + sc, 0),
                            gammas["gc"], betas["bc"])

        def bn_s2d(h, g, b):
            mu, var = bn_stats(h)
            return ((h - expand_vector(mu))
                    * jax.lax.rsqrt(expand_vector(var) + 1e-5)
                    * expand_vector(g) + expand_vector(b))

        def s2d(x):
            xs = space_to_depth(x)
            a = jnp.maximum(bn_s2d(conv_s2d(xs, s2d_kernel(ws["w1"])),
                                   gammas["g1"], betas["b1"]), 0)
            b = jnp.maximum(bn_s2d(conv_s2d(a, s2d_kernel(ws["w2"])),
                                   gammas["g2"], betas["b2"]), 0)
            c = jnp.maximum(bn_s2d(conv_s2d(b, s2d_kernel(ws["w3"])),
                                   gammas["g3"], betas["b3"]), 0)
            cat = jnp.concatenate([a, b, c], axis=-1)
            sc = bn_s2d(conv_s2d(xs, s2d_kernel(ws["wsc"])),
                        gammas["gs"], betas["bs"])
            return depth_to_space(bn_s2d(jnp.maximum(cat + sc, 0),
                                         gammas["gc"], betas["bc"]))

        ref = np.asarray(plain(x))
        got = np.asarray(s2d(x))
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)


class TestModelIntegration:
    """create_model(..., s2d=True) must reproduce the plain path exactly:
    identical parameter tree, matching eval/train outputs AND matching
    running-statistics updates."""

    def _check_model(self, name, tol=2e-4):
        import jax
        from jcfszxc_unet_tpu.models import create_model

        rng = np.random.RandomState(11)
        x = jnp.asarray(rng.rand(2, 32, 32, 3), jnp.float32)
        plain = create_model(name)
        fast = create_model(name, s2d=True)
        variables = jax.jit(
            lambda k: plain.init({"params": k}, x[:1], train=False)
        )(jax.random.PRNGKey(0))
        # same tree: the s2d path declares parameters at identical paths
        v2 = fast.init({"params": jax.random.PRNGKey(0)}, x[:1], train=False)
        assert (jax.tree_util.tree_structure(variables)
                == jax.tree_util.tree_structure(v2))

        # eval forward
        a = plain.apply(variables, x, train=False)
        b = fast.apply(variables, x, train=False)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=tol, atol=tol)

        # train forward + running-stat updates (dropout ACTIVE where the
        # model has it: the s2d rank-5 mask draw consumes the same bits,
        # so the masks are identical and train mode stays comparable)
        rngs = {"dropout": jax.random.PRNGKey(7)}
        a, mut_a = plain.apply(variables, x, train=True,
                               mutable=["batch_stats"], rngs=rngs)
        b, mut_b = fast.apply(variables, x, train=True,
                              mutable=["batch_stats"], rngs=rngs)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=tol, atol=tol)
        fa = jax.tree_util.tree_leaves_with_path(mut_a["batch_stats"])
        fb = jax.tree_util.tree_leaves_with_path(mut_b["batch_stats"])
        assert len(fa) == len(fb)
        for (pa, la), (pb, lb) in zip(fa, fb):
            assert pa == pb
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=tol, atol=tol,
                                       err_msg=str(pa))

    def test_multiresunet(self):
        self._check_model("MultiResUNet.MultiResUNet")

    def test_nested_unet(self):
        self._check_model("UNetPP.NestedUNet")

    def test_frunet(self):
        # dropout=0.2 stays ACTIVE in train mode here — mask equality
        # across execution modes is part of what this pins
        self._check_model("FRUNet.FRUNet")

    def test_frconv_dropout_masks_match(self):
        """The s2d FRConv draws its channel-dropout mask on a
        (B,1,1,C,1) view; same rng + same bit count as the plain path's
        (B,1,1,C), so with dropout ACTIVE the two modes stay equal."""
        import jax
        from jcfszxc_unet_tpu.ops.blocks import FRConv

        rng = np.random.RandomState(14)
        x = jnp.asarray(rng.randn(2, 8, 8, 4), jnp.float32)
        plain = FRConv(4, 4, dp=0.5)
        fast = FRConv(4, 4, dp=0.5, s2d=True)
        variables = plain.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, train=False)
        rngs = {"dropout": jax.random.PRNGKey(3)}
        a, _ = plain.apply(variables, x, train=True,
                           mutable=["batch_stats"], rngs=rngs)
        b5, _ = fast.apply(variables, space_to_depth(x), train=True,
                           mutable=["batch_stats"], rngs=rngs)
        b = depth_to_space(b5)
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-5, atol=1e-5)

    def test_production_train_step_trajectory(self):
        """Output parity does not imply GRADIENT parity: run 3 production
        train steps (fwd/bwd + clip + RMSprop + NaN guard) for plain vs
        s2d MultiResUNet from identical state and require matching loss
        trajectories and final params."""
        import jax
        from jcfszxc_unet_tpu.models import create_model
        from jcfszxc_unet_tpu.train.optim import make_optimizer
        from jcfszxc_unet_tpu.train.state import create_train_state
        from jcfszxc_unet_tpu.train.trainer import make_batch_step_fn

        rng = np.random.RandomState(13)
        imgs = jnp.asarray(rng.rand(3, 2, 32, 32, 3), jnp.float32)
        labs = jnp.asarray((rng.rand(3, 2, 32, 32, 1) > 0.7), jnp.float32)

        # lr = the reference default 1e-6 (as in
        # test_train_step_torch_parity): torch-RMSprop's first step is
        # ~lr*3.16*sign(g), so at large lr any rounding-level gradient
        # difference on noise-gradient params flips signs and the
        # trajectories diverge chaotically — an optimizer property, not
        # an s2d defect.
        losses, finals = [], []
        for flag in (False, True):
            model = create_model("MultiResUNet.MultiResUNet", s2d=flag)
            tx = make_optimizer(1e-6)
            state = create_train_state(model, tx, jax.random.PRNGKey(0),
                                       jnp.zeros((1, 32, 32, 3), jnp.float32))
            step = make_batch_step_fn(model, tx, n_classes=model.n_classes)
            traj = []
            for i in range(3):
                state, loss, ok = step(state, imgs[i], labs[i],
                                       jax.random.PRNGKey(i))
                traj.append(float(loss))
                assert bool(ok)
            losses.append(traj)
            finals.append(state.params)
        np.testing.assert_allclose(losses[1], losses[0], rtol=1e-4)
        for (pa, la), (pb, lb) in zip(
                jax.tree_util.tree_leaves_with_path(finals[0]),
                jax.tree_util.tree_leaves_with_path(finals[1])):
            assert pa == pb
            # per-step updates are ~3.16*lr (amplified ~3x over 3 steps by
            # the 0.999-momentum buffer); allow isolated sign flips on
            # rounding-noise gradients but nothing at real-defect scale
            np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                       rtol=0, atol=1e-4, err_msg=str(pa))

    def test_s2d_capable_registry(self):
        from jcfszxc_unet_tpu.models import s2d_capable

        assert s2d_capable() == ["FRUNet.FRUNet",
                                 "MultiResUNet.MultiResUNet",
                                 "UNetPP.NestedUNet"]

    def test_checkpoint_records_s2d(self, tmp_path):
        """train.py --s2d stores the execution mode in model_kwargs, so
        evaluate.py / Predictor reconstruct the s2d model from the
        checkpoint alone."""
        import jax
        from jcfszxc_unet_tpu.models import create_model
        from jcfszxc_unet_tpu.train import checkpoint as ckpt

        model = create_model("MultiResUNet.MultiResUNet", s2d=True)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, 32, 32, 3), jnp.float32), train=False)
        path = str(tmp_path / "m.ckpt")
        ckpt.save_model(path, "MultiResUNet.MultiResUNet", {"s2d": True},
                        variables["params"], variables.get("batch_stats", {}))
        loaded, _, config = ckpt.load_model(path)
        assert loaded.s2d
        assert config["model_kwargs"]["s2d"] is True

    def test_odd_input_falls_back(self):
        """A flagged block at odd spatial dims silently uses the plain
        path (identical params), so arbitrary eval geometries still work."""
        import jax
        from jcfszxc_unet_tpu.ops.blocks import Multiresblock

        rng = np.random.RandomState(12)
        x = jnp.asarray(rng.rand(1, 7, 9, 6), jnp.float32)
        plain = Multiresblock(6, 8)
        fast = Multiresblock(6, 8, s2d=True)
        variables = plain.init({"params": jax.random.PRNGKey(0)}, x,
                               train=False)
        a = plain.apply(variables, x, train=False)
        b = fast.apply(variables, x, train=False)
        np.testing.assert_array_equal(np.asarray(b), np.asarray(a))
