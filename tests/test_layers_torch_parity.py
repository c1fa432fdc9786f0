"""Numerical parity of the NHWC layer primitives against torch oracles.

Torch (CPU) is used purely as a test oracle: weights are transplanted from
torch modules into the Flax layers and outputs compared.  This pins the
geometry/semantics decisions in ops/layers.py (ConvTranspose padding and
output_padding emulation, pooling-with-indices, bilinear align_corners,
BatchNorm conventions) to the reference's runtime behavior.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from jcfszxc_unet_tpu.ops import layers as L


def _nhwc(t):  # torch NCHW -> np NHWC
    return t.detach().permute(0, 2, 3, 1).numpy()


def _nchw(a):  # np NHWC -> torch NCHW
    return torch.from_numpy(np.asarray(a)).permute(0, 3, 1, 2)


class TestConv2d:
    @pytest.mark.parametrize("stride,padding,dilation", [(1, 1, 1), (2, 1, 1), (2, 0, 1), (1, 2, 2)])
    def test_matches_torch(self, stride, padding, dilation):
        rng = np.random.RandomState(0)
        x = rng.randn(2, 13, 11, 5).astype(np.float32)
        w = rng.randn(7, 5, 3, 3).astype(np.float32)  # (out,in,kh,kw)
        b = rng.randn(7).astype(np.float32)
        want = F.conv2d(_nchw(x), torch.from_numpy(w), torch.from_numpy(b),
                        stride=stride, padding=padding, dilation=dilation)
        mod = L.Conv2d(5, 7, 3, stride=stride, padding=padding, dilation=dilation)
        variables = {"params": {"conv": {
            "kernel": jnp.asarray(w.transpose(2, 3, 1, 0)),
            "bias": jnp.asarray(b),
        }}}
        got = mod.apply(variables, jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-4)


class TestConvTranspose2d:
    @pytest.mark.parametrize(
        "k,s,p,op",
        [(2, 2, 0, 0),    # Up/UpConv (unet_parts.py:56, 876)
         (4, 2, 1, 0),    # Upsample_n_Concat (unet_parts.py:383)
         (3, 2, 1, 1),    # TransFuseNet decoder (RetinaLiteNet.py:122)
         (2, 2, 0, 0)],
    )
    def test_matches_torch(self, k, s, p, op):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 9, 7, 4).astype(np.float32)
        w = rng.randn(4, 6, k, k).astype(np.float32)  # (in,out,kh,kw)
        b = rng.randn(6).astype(np.float32)
        want = F.conv_transpose2d(_nchw(x), torch.from_numpy(w),
                                  torch.from_numpy(b), stride=s, padding=p,
                                  output_padding=op)
        mod = L.ConvTranspose2d(4, 6, k, stride=s, padding=p, output_padding=op)
        # flax ConvTranspose (transpose_kernel=False) computes the scatter
        # with an unflipped HWIO kernel == torch's flipped-kernel gather;
        # mapping: torch (in,out,kh,kw) -> flip(kh,kw) -> (kh,kw,in,out).
        kernel = w.transpose(2, 3, 0, 1)[::-1, ::-1].copy()
        variables = {"params": {"conv": {
            "kernel": jnp.asarray(kernel),
            "bias": jnp.asarray(b),
        }}}
        got = mod.apply(variables, jnp.asarray(x))
        assert got.shape == _nhwc(want).shape
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-4)


class TestPooling:
    def test_maxpool_matches_torch(self):
        x = np.random.RandomState(2).randn(2, 12, 10, 3).astype(np.float32)
        want = F.max_pool2d(_nchw(x), 2, 2)
        got = L.max_pool2d(jnp.asarray(x), 2)
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-6)

    def test_maxpool_floor_odd(self):
        x = np.random.RandomState(3).randn(1, 13, 11, 2).astype(np.float32)
        want = F.max_pool2d(_nchw(x), 2, 2)
        got = L.max_pool2d(jnp.asarray(x), 2)
        assert got.shape == _nhwc(want).shape
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-6)

    def test_pool_unpool_roundtrip_matches_torch(self):
        x = np.random.RandomState(4).randn(2, 8, 8, 3).astype(np.float32)
        tp, idx = F.max_pool2d(_nchw(x), 2, 2, return_indices=True)
        tun = F.max_unpool2d(tp, idx, 2, 2)
        pooled, onehot = L.max_pool2d_with_indices(jnp.asarray(x))
        got = L.max_unpool2d(pooled, onehot)
        np.testing.assert_allclose(np.asarray(got), _nhwc(tun), rtol=1e-6)

    def test_unpool_ties_pick_first(self):
        # constant window: torch argmax picks the first element
        x = np.ones((1, 4, 4, 1), np.float32)
        tp, idx = F.max_pool2d(_nchw(x), 2, 2, return_indices=True)
        tun = F.max_unpool2d(tp, idx, 2, 2)
        pooled, onehot = L.max_pool2d_with_indices(jnp.asarray(x))
        got = L.max_unpool2d(pooled, onehot)
        np.testing.assert_allclose(np.asarray(got), _nhwc(tun), rtol=1e-6)

    def test_avgpool_count_include_pad(self):
        x = np.random.RandomState(5).randn(1, 8, 8, 4).astype(np.float32)
        want = F.avg_pool2d(_nchw(x), 3, stride=1, padding=1)  # torch default includes pad
        got = L.avg_pool2d(jnp.asarray(x), 3, stride=1, padding=1)
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-5, atol=1e-6)


class TestResize:
    def test_nearest_matches_torch(self):
        x = np.random.RandomState(6).randn(2, 5, 7, 3).astype(np.float32)
        want = F.interpolate(_nchw(x), scale_factor=2, mode="nearest")
        got = L.upsample_nearest(jnp.asarray(x), 2)
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-6)

    def test_bilinear_align_corners_matches_torch(self):
        x = np.random.RandomState(7).randn(2, 6, 5, 3).astype(np.float32)
        want = F.interpolate(_nchw(x), scale_factor=2, mode="bilinear",
                             align_corners=True)
        got = L.upsample_bilinear(jnp.asarray(x), 2, align_corners=True)
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-5, atol=1e-6)

    def test_bilinear_half_pixel_matches_torch(self):
        x = np.random.RandomState(8).randn(1, 4, 6, 2).astype(np.float32)
        want = F.interpolate(_nchw(x), scale_factor=2, mode="bilinear",
                             align_corners=False)
        got = L.upsample_bilinear(jnp.asarray(x), 2, align_corners=False)
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-5, atol=1e-6)

    def test_split_input_conv_matches_fused(self):
        # Conv2d with a tuple of inputs must equal the fused conv of their
        # concat (the NestedUNet narrow-concat optimization), across
        # padding/stride/dilation/bias, in f32 and under a bf16 dtype.
        import jax
        import jcfszxc_unet_tpu.ops.layers as L

        rng = np.random.RandomState(11)
        # bf16 tolerance is one bf16 ulp at the data's magnitude: the fused
        # conv rounds one accumulated sum while the split form adds f32
        # partials — same precision class, ±1-ulp coin flips at rounding
        # boundaries.
        for pad, stride, dil, bias, dt, tol in [
            (1, 1, 1, True, None, 2e-5),
            ("same", 1, 2, False, None, 2e-5),
            (0, 2, 1, True, jnp.bfloat16, 8e-3),
        ]:
            xs = [jnp.asarray(rng.randn(2, 12, 10, c).astype(np.float32))
                  for c in (3, 5, 8)]
            conv = L.Conv2d(16, 7, 3, stride=stride, padding=pad,
                            dilation=dil, use_bias=bias, dtype=dt)
            v = jax.jit(conv.init)(jax.random.PRNGKey(0), tuple(xs))
            v2 = jax.jit(conv.init)(
                jax.random.PRNGKey(0), jnp.concatenate(xs, axis=-1))
            # identical param trees from either input form
            jax.tree.map(np.testing.assert_array_equal, v, v2)
            got = conv.apply(v, tuple(xs))
            want = conv.apply(v, jnp.concatenate(xs, axis=-1))
            np.testing.assert_allclose(
                np.asarray(got, np.float32), np.asarray(want, np.float32),
                rtol=tol, atol=tol)

    def test_bilinear_matmul_form_matches_torch(self):
        # the MXU einsum formulation must satisfy the same torch oracle
        for ac, seed in [(True, 7), (False, 8)]:
            x = np.random.RandomState(seed).randn(2, 6, 5, 3).astype(np.float32)
            want = F.interpolate(_nchw(x), scale_factor=2, mode="bilinear",
                                 align_corners=ac)
            got = L.upsample_bilinear_matmul(jnp.asarray(x), 2, align_corners=ac)
            np.testing.assert_allclose(
                np.asarray(got), _nhwc(want), rtol=1e-5, atol=1e-6)


class TestPadOrCrop:
    def test_positive_pad_matches_torch(self):
        x = np.random.RandomState(9).randn(1, 5, 6, 2).astype(np.float32)
        # reference convention (unet_parts.py:67): leading side gets d//2,
        # trailing side the remainder -> (left, right, top, bottom)
        want = F.pad(_nchw(x), [1, 1, 1, 2])  # dW=2, dH=3
        got = L.pad_or_crop_to(jnp.asarray(x), 5 + 3, 6 + 2)
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-6)

    def test_negative_pad_crops_like_torch(self):
        # MCUNet Up_v1 path: F.pad with negative values crops.  The oracle
        # derives pads exactly as the reference does (unet_parts.py:65-67):
        # [dW//2, dW - dW//2, dH//2, dH - dH//2] with Python floor division,
        # so an odd negative diff crops MORE from the leading side.
        x = np.random.RandomState(10).randn(1, 8, 8, 2).astype(np.float32)
        dH, dW = -3, -2
        want = F.pad(_nchw(x), [dW // 2, dW - dW // 2, dH // 2, dH - dH // 2])
        got = L.pad_or_crop_to(jnp.asarray(x), 8 + dH, 8 + dW)
        assert got.shape == _nhwc(want).shape
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-6)

    def test_odd_negative_diffs_sweep_vs_torch(self):
        # Sweep every (dH, dW) in [-5, 3]^2 against the reference formula —
        # covers the odd-negative cases reachable via --patch-size 40/24.
        x = np.random.RandomState(20).randn(1, 12, 12, 2).astype(np.float32)
        for dH in range(-5, 4):
            for dW in range(-5, 4):
                want = F.pad(
                    _nchw(x), [dW // 2, dW - dW // 2, dH // 2, dH - dH // 2]
                )
                got = L.pad_or_crop_to(jnp.asarray(x), 12 + dH, 12 + dW)
                np.testing.assert_allclose(
                    np.asarray(got), _nhwc(want), rtol=1e-6,
                    err_msg=f"dH={dH} dW={dW}",
                )


class TestBatchNorm:
    def test_train_mode_matches_torch(self):
        x = np.random.RandomState(11).randn(4, 6, 6, 5).astype(np.float32) * 3 + 1
        tbn = torch.nn.BatchNorm2d(5)
        tbn.train()
        want = tbn(_nchw(x))
        mod = L.BatchNorm2d(5)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
        got, updated = mod.apply(variables, jnp.asarray(x), True,
                                 mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-4)
        # Running stats follow torch's momentum=0.1 convention; torch uses
        # the *unbiased* batch variance for the running update.
        n = x.shape[0] * x.shape[1] * x.shape[2]
        batch_mean = x.mean(axis=(0, 1, 2))
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["bn"]["mean"]),
            0.9 * 0 + 0.1 * batch_mean, rtol=1e-4, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(tbn.running_mean), 0.1 * batch_mean, rtol=1e-4, atol=1e-4
        )
        # running_var must match torch exactly: 0.9*1 + 0.1*unbiased_var.
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["bn"]["var"]),
            np.asarray(tbn.running_var.detach()), rtol=1e-5, atol=1e-6,
        )

    def test_running_var_bessel_small_batch(self):
        # Tiny n makes the n/(n-1) factor large (n=2*2*2=8 -> 8/7): this
        # fails loudly if the biased variance is fed to the running update.
        x = np.random.RandomState(40).randn(2, 2, 2, 3).astype(np.float32) * 5
        tbn = torch.nn.BatchNorm2d(3)
        tbn.train()
        want = tbn(_nchw(x))
        mod = L.BatchNorm2d(3)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
        got, updated = mod.apply(variables, jnp.asarray(x), True,
                                 mutable=["batch_stats"])
        np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["bn"]["var"]),
            np.asarray(tbn.running_var.detach()), rtol=1e-5, atol=1e-6,
        )
        np.testing.assert_allclose(
            np.asarray(updated["batch_stats"]["bn"]["mean"]),
            np.asarray(tbn.running_mean.detach()), rtol=1e-5, atol=1e-6,
        )
        # Eval-mode outputs now agree with the torch-trained module too.
        tbn.eval()
        want_eval = tbn(_nchw(x))
        got_eval = mod.apply(
            {"params": variables["params"],
             "batch_stats": updated["batch_stats"]},
            jnp.asarray(x), False,
        )
        np.testing.assert_allclose(
            np.asarray(got_eval), _nhwc(want_eval), rtol=1e-4, atol=1e-5
        )

    def test_eval_mode_uses_running_stats(self):
        x = np.random.RandomState(12).randn(2, 4, 4, 3).astype(np.float32)
        mod = L.BatchNorm2d(3)
        variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), True)
        got = mod.apply(variables, jnp.asarray(x), False)
        # fresh stats: mean 0 var 1 -> identity (scale 1, bias 0)
        np.testing.assert_allclose(np.asarray(got), x, rtol=1e-4, atol=1e-4)


class TestDropout2d:
    def test_channel_broadcast(self):
        x = jnp.ones((4, 8, 8, 16))
        out = L.dropout2d(x, 0.5, deterministic=False, rng=jax.random.PRNGKey(0))
        out = np.asarray(out)
        # each (sample, channel) plane is either all 0 or all 2
        planes = out.transpose(0, 3, 1, 2).reshape(4 * 16, -1)
        assert set(np.unique(planes)).issubset({0.0, 2.0})
        per_plane = planes.max(axis=1)
        assert 0.0 in per_plane and 2.0 in per_plane


class TestPoolIndicesValidation:
    def test_odd_input_raises_clear_error(self):
        import pytest

        x = jnp.zeros((1, 5, 6, 2))
        with pytest.raises(ValueError, match="divisible by 32"):
            L.max_pool2d_with_indices(x)
