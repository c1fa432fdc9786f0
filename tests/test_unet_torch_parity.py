"""WHOLE-MODEL weight-transplant parity: the canonical UNet forward must
match a torch functional oracle end-to-end in eval mode.

Block-level parity tests can't catch wiring mistakes (skip ordering,
concat direction, pad placement) — this composes the full encoder/decoder
with randomized weights AND randomized BN running stats transplanted into
the Flax model, pinning the complete dataflow of models/UNet.py to the
reference architecture (UNet.py:39-55)."""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from jcfszxc_unet_tpu.models import create_model


class _TorchParams:
    """Random torch-side parameters for one DoubleConv / ConvT / head."""

    def __init__(self, rng):
        self.rng = rng

    def conv(self, cin, cout, k=3):
        w = torch.from_numpy(
            (self.rng.randn(cout, cin, k, k) * (1.0 / np.sqrt(cin * k * k))
             ).astype(np.float32))
        return w

    def bn(self, c):
        return dict(
            weight=torch.from_numpy(self.rng.rand(c).astype(np.float32) + 0.5),
            bias=torch.from_numpy((self.rng.randn(c) * 0.1).astype(np.float32)),
            mean=torch.from_numpy((self.rng.randn(c) * 0.2).astype(np.float32)),
            var=torch.from_numpy((self.rng.rand(c).astype(np.float32) + 0.5)),
        )

    def convt(self, cin, cout):
        w = torch.from_numpy(
            (self.rng.randn(cin, cout, 2, 2) * (1.0 / np.sqrt(cout * 4))
             ).astype(np.float32))
        b = torch.from_numpy((self.rng.randn(cout) * 0.05).astype(np.float32))
        return w, b


def _double_conv_t(x, p):
    """torch functional (conv3x3 no-bias -> BN(eval) -> relu) x2."""
    for i in (0, 1):
        x = F.conv2d(x, p[f"w{i}"], padding=1)
        bn = p[f"bn{i}"]
        x = F.batch_norm(x, bn["mean"], bn["var"], bn["weight"], bn["bias"],
                         training=False)
        x = F.relu(x)
    return x


def _make_dc_params(tp, cin, cout):
    return {"w0": tp.conv(cin, cout), "bn0": tp.bn(cout),
            "w1": tp.conv(cout, cout), "bn1": tp.bn(cout)}


def _dc_to_flax(p):
    def conv_k(w):
        return jnp.asarray(w.numpy().transpose(2, 3, 1, 0))

    params = {
        "Conv2d_0": {"conv": {"kernel": conv_k(p["w0"])}},
        "Conv2d_1": {"conv": {"kernel": conv_k(p["w1"])}},
        "BatchNorm2d_0": {"bn": {
            "scale": jnp.asarray(p["bn0"]["weight"].numpy()),
            "bias": jnp.asarray(p["bn0"]["bias"].numpy())}},
        "BatchNorm2d_1": {"bn": {
            "scale": jnp.asarray(p["bn1"]["weight"].numpy()),
            "bias": jnp.asarray(p["bn1"]["bias"].numpy())}},
    }
    stats = {
        "BatchNorm2d_0": {"bn": {
            "mean": jnp.asarray(p["bn0"]["mean"].numpy()),
            "var": jnp.asarray(p["bn0"]["var"].numpy())}},
        "BatchNorm2d_1": {"bn": {
            "mean": jnp.asarray(p["bn1"]["mean"].numpy()),
            "var": jnp.asarray(p["bn1"]["var"].numpy())}},
    }
    return params, stats


def _convt_to_flax(w, b):
    k = w.numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy()  # flip for flax
    return {"conv": {"kernel": jnp.asarray(k), "bias": jnp.asarray(b.numpy())}}


def test_unet_full_forward_matches_torch():
    rng = np.random.RandomState(0)
    tp = _TorchParams(rng)
    chans = [(3, 64), (64, 128), (128, 256), (256, 512), (512, 1024)]
    enc = [_make_dc_params(tp, cin, cout) for cin, cout in chans]
    dec_t = [tp.convt(c, c // 2) for c in (1024, 512, 256, 128)]
    dec_dc = [_make_dc_params(tp, c, c // 2) for c in (1024, 512, 256, 128)]
    w_out = tp.conv(64, 1, k=1)
    b_out = torch.from_numpy((rng.randn(1) * 0.05).astype(np.float32))

    # ---- torch oracle forward (UNet.py:39-55 dataflow) ----
    x_np = rng.rand(2, 32, 32, 3).astype(np.float32)
    x = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    x1 = _double_conv_t(x, enc[0])
    x2 = _double_conv_t(F.max_pool2d(x1, 2), enc[1])
    x3 = _double_conv_t(F.max_pool2d(x2, 2), enc[2])
    x4 = _double_conv_t(F.max_pool2d(x3, 2), enc[3])
    x5 = _double_conv_t(F.max_pool2d(x4, 2), enc[4])
    h = x5
    for (wt, bt), dc, skip in zip(dec_t, dec_dc, (x4, x3, x2, x1)):
        up = F.conv_transpose2d(h, wt, bt, stride=2)
        h = _double_conv_t(torch.cat([skip, up], dim=1), dc)
    want = F.conv2d(h, w_out, b_out).permute(0, 2, 3, 1).detach().numpy()

    # ---- transplant into the Flax UNet ----
    params = {"inc": {}, "outc": {}}
    stats = {}
    inc_p, inc_s = _dc_to_flax(enc[0])
    params["inc"] = inc_p
    stats["inc"] = inc_s
    for i in range(4):
        p, s = _dc_to_flax(enc[i + 1])
        params[f"down{i + 1}"] = {"DoubleConv_0": p}
        stats[f"down{i + 1}"] = {"DoubleConv_0": s}
    for i in range(4):
        p, s = _dc_to_flax(dec_dc[i])
        params[f"up{i + 1}"] = {
            "ConvTranspose2d_0": _convt_to_flax(*dec_t[i]),
            "DoubleConv_0": p,
        }
        stats[f"up{i + 1}"] = {"DoubleConv_0": s}
    params["outc"] = {"Conv2d_0": {"conv": {
        "kernel": jnp.asarray(w_out.numpy().transpose(2, 3, 1, 0)),
        "bias": jnp.asarray(b_out.numpy()),
    }}}

    model = create_model("UNet.UNet")
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
