"""BCDU_net_D1 whole-model weight-transplant parity vs a torch functional
oracle — pins the decoder's ConvLSTM skip fusion: the [skip, upsampled]
time-stack order, the *backward* scan direction, and the encoder's
pool3-of-conv3 (not drop3) quirk (models/BCDUNet.py vs reference
BCDUNet.py:205-253).  Eval mode (dropout off)."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from jcfszxc_unet_tpu.models import create_model


def _conv_p(rng, cin, cout, k=3):
    w = torch.from_numpy(
        (rng.randn(cout, cin, k, k) * (1.0 / np.sqrt(cin * k * k))
         ).astype(np.float32))
    b = torch.from_numpy((rng.randn(cout) * 0.05).astype(np.float32))
    return w, b


def _bn_p(rng, c):
    return dict(
        weight=torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5),
        bias=torch.from_numpy((rng.randn(c) * 0.1).astype(np.float32)),
        mean=torch.from_numpy((rng.randn(c) * 0.2).astype(np.float32)),
        var=torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5),
    )


def _convt_p(rng, cin, cout):
    w = torch.from_numpy(
        (rng.randn(cin, cout, 2, 2) * (1.0 / np.sqrt(cout * 4))
         ).astype(np.float32))
    b = torch.from_numpy((rng.randn(cout) * 0.05).astype(np.float32))
    return w, b


def test_bcdu_d1_full_forward_matches_torch():
    rng = np.random.RandomState(3)
    # encoder ConvBlocks (conv-bias-relu x2, no BN)
    cb = {
        "conv1": [_conv_p(rng, 3, 64), _conv_p(rng, 64, 64)],
        "conv2": [_conv_p(rng, 64, 128), _conv_p(rng, 128, 128)],
        "conv3": [_conv_p(rng, 128, 256), _conv_p(rng, 256, 256)],
        "conv6": [_conv_p(rng, 128, 256), _conv_p(rng, 256, 256)],
        "conv7": [_conv_p(rng, 64, 128), _conv_p(rng, 128, 128)],
    }
    conv4 = _conv_p(rng, 256, 512)
    conv4_1 = _conv_p(rng, 512, 512)
    ups = {  # UpConv: ConvT(k2,s2) -> BN -> relu
        "up6": (_convt_p(rng, 512, 256), _bn_p(rng, 256)),
        "up7": (_convt_p(rng, 256, 128), _bn_p(rng, 128)),
        "up8": (_convt_p(rng, 128, 64), _bn_p(rng, 64)),
    }
    lstm = {  # one conv on [x, h] -> 4*hidden gates
        "conv_lstm6": _conv_p(rng, 256 + 128, 4 * 128),
        "conv_lstm7": _conv_p(rng, 128 + 64, 4 * 64),
        "conv_lstm8": _conv_p(rng, 64 + 32, 4 * 32),
    }
    head = [_conv_p(rng, 32, 64), _conv_p(rng, 64, 64), _conv_p(rng, 64, 2),
            _conv_p(rng, 2, 1, k=1)]

    def cb_fwd(x, plist):
        for w, b in plist:
            x = F.relu(F.conv2d(x, w, b, padding=1))
        return x

    def up_fwd(x, p):
        (w, b), bn = p
        x = F.conv_transpose2d(x, w, b, stride=2)
        x = F.batch_norm(x, bn["mean"], bn["var"], bn["weight"], bn["bias"],
                         training=False)
        return F.relu(x)

    def lstm_fwd(skip, up, p, hidden):
        # backward over the time stack [skip, up] -> process up then skip
        w, b = p
        b_, c, hgt, wid = skip.shape
        h = torch.zeros(b_, hidden, hgt, wid)
        cst = torch.zeros(b_, hidden, hgt, wid)
        for frame in (up, skip):  # go_backwards=True on [skip, up]
            gates = F.conv2d(torch.cat([frame, h], dim=1), w, b, padding=1)
            i, f, o, g = torch.split(gates, hidden, dim=1)
            i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
            g = torch.tanh(g)
            cst = f * cst + i * g
            h = o * torch.tanh(cst)
        return h

    x_np = rng.rand(2, 16, 16, 3).astype(np.float32)
    v = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    conv1 = cb_fwd(v, cb["conv1"])
    conv2 = cb_fwd(F.max_pool2d(conv1, 2), cb["conv2"])
    conv3 = cb_fwd(F.max_pool2d(conv2, 2), cb["conv3"])
    pool3 = F.max_pool2d(conv3, 2)  # pools conv3, not drop3
    h4 = F.relu(F.conv2d(pool3, *conv4, padding=1))
    h4 = F.relu(F.conv2d(h4, *conv4_1, padding=1))
    up6 = up_fwd(h4, ups["up6"])
    h = cb_fwd(lstm_fwd(conv3, up6, lstm["conv_lstm6"], 128), cb["conv6"])
    up7 = up_fwd(h, ups["up7"])
    h = cb_fwd(lstm_fwd(conv2, up7, lstm["conv_lstm7"], 64), cb["conv7"])
    up8 = up_fwd(h, ups["up8"])
    h = lstm_fwd(conv1, up8, lstm["conv_lstm8"], 32)
    h = F.relu(F.conv2d(h, *head[0], padding=1))
    h = F.relu(F.conv2d(h, *head[1], padding=1))
    h = F.relu(F.conv2d(h, *head[2], padding=1))
    h = torch.sigmoid(F.conv2d(h, *head[3]))
    want = h.permute(0, 2, 3, 1).detach().numpy()

    # ---- transplant ----
    def conv_flax(w, b):
        return {"conv": {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b.numpy())}}

    def convt_flax(w, b):
        k = w.numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy()
        return {"conv": {"kernel": jnp.asarray(k),
                         "bias": jnp.asarray(b.numpy())}}

    def cb_flax(plist):
        return {f"Conv2d_{i}": conv_flax(w, b) for i, (w, b) in enumerate(plist)}

    params = {
        "encoder": {
            "conv1": cb_flax(cb["conv1"]),
            "conv2": cb_flax(cb["conv2"]),
            "conv3": cb_flax(cb["conv3"]),
        },
        "conv4": conv_flax(*conv4),
        "conv4_1": conv_flax(*conv4_1),
        "decoder": {
            "conv6": cb_flax(cb["conv6"]),
            "conv7": cb_flax(cb["conv7"]),
            "conv8_1": conv_flax(*head[0]),
            "conv8_2": conv_flax(*head[1]),
            "conv8_3": conv_flax(*head[2]),
            "conv9": conv_flax(*head[3]),
        },
    }
    stats = {"decoder": {}}
    for name, ((w, b), bn) in ups.items():
        params["decoder"][name] = {
            "ConvTranspose2d_0": convt_flax(w, b),
            "BatchNorm2d_0": {"bn": {
                "scale": jnp.asarray(bn["weight"].numpy()),
                "bias": jnp.asarray(bn["bias"].numpy())}},
        }
        stats["decoder"][name] = {"BatchNorm2d_0": {"bn": {
            "mean": jnp.asarray(bn["mean"].numpy()),
            "var": jnp.asarray(bn["var"].numpy())}}}
    for name, (w, b) in lstm.items():
        params["decoder"][name] = {"Conv2d_0": conv_flax(w, b)}

    model = create_model("BCDUNet.BCDU_net_D1", N=16)
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
