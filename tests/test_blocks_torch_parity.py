"""Weight-transplant parity for the trickiest blocks: ConvLSTM cell
unrolling (incl. go_backwards), the additive attention gate, the shared
recurrent conv quirk, and the MultiheadAttention bottleneck.  Torch modules
are built *from the documented semantics* as oracles and weights are copied
into the Flax blocks.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from jcfszxc_unet_tpu.ops import blocks as B


def _nhwc(t):
    return t.detach().permute(0, 2, 3, 1).numpy()


def _nchw(a):
    return torch.from_numpy(np.asarray(a)).permute(0, 3, 1, 2)


def conv_params(tconv):
    p = {"kernel": jnp.asarray(
        tconv.weight.detach().numpy().transpose(2, 3, 1, 0))}
    if tconv.bias is not None:
        p["bias"] = jnp.asarray(tconv.bias.detach().numpy())
    return {"conv": p}


def test_convlstm_matches_torch_cell():
    """ConvLSTM over T=2 with go_backwards=True (the BCDUNet decoder config,
    unet_parts.py:843-869 semantics)."""
    torch.manual_seed(0)
    in_dim, hid = 6, 4
    tconv = nn.Conv2d(in_dim + hid, 4 * hid, 3, padding=1)

    def torch_convlstm(x_tbchw, go_backwards=True):
        b, t, c, h, w = x_tbchw.shape
        hs = torch.zeros(b, hid, h, w)
        cs = torch.zeros(b, hid, h, w)
        order = range(t - 1, -1, -1) if go_backwards else range(t)
        for step in order:
            combined = torch.cat([x_tbchw[:, step], hs], dim=1)
            gates = tconv(combined)
            i, f, o, g = torch.split(gates, hid, dim=1)
            i, f, o = torch.sigmoid(i), torch.sigmoid(f), torch.sigmoid(o)
            g = torch.tanh(g)
            cs = f * cs + i * g
            hs = o * torch.tanh(cs)
        return hs

    rng = np.random.RandomState(0)
    x = rng.randn(2, 2, 5, 5, in_dim).astype(np.float32)  # (B,T,H,W,C)
    x_t = torch.from_numpy(x.transpose(0, 1, 4, 2, 3))
    want = torch_convlstm(x_t)

    mod = B.ConvLSTM2D(in_dim, hid, 3, 1, go_backwards=True)
    variables = {"params": {"Conv2d_0": conv_params(tconv)}}
    got = mod.apply(variables, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-5
    )


def test_attention_gate_matches_torch():
    """psi = sigmoid(BN(conv1x1(relu(W_g g + W_x x)))); out = x*psi
    (unet_parts.py:149-176), eval-mode BN."""
    torch.manual_seed(1)
    fg, fl, fi = 8, 8, 4
    wg, wx = nn.Conv2d(fg, fi, 1), nn.Conv2d(fl, fi, 1)
    psi_conv = nn.Conv2d(fi, 1, 1)
    bn_g, bn_x, bn_psi = nn.BatchNorm2d(fi), nn.BatchNorm2d(fi), nn.BatchNorm2d(1)
    for bn in (bn_g, bn_x, bn_psi):
        bn.eval()

    def torch_gate(g, x):
        g1 = bn_g(wg(g))
        x1 = bn_x(wx(x))
        p = torch.sigmoid(bn_psi(psi_conv(F.relu(g1 + x1))))
        return x * p

    rng = np.random.RandomState(2)
    g = rng.randn(2, 6, 6, fg).astype(np.float32)
    x = rng.randn(2, 6, 6, fl).astype(np.float32)
    want = torch_gate(_nchw(g), _nchw(x))

    mod = B.AttentionBlock(fg, fl, fi)
    init = mod.init(jax.random.PRNGKey(0), jnp.asarray(g), jnp.asarray(x), False)
    params = jax.tree.map(np.asarray, init["params"])
    params["Conv2d_0"] = conv_params(wg)
    params["Conv2d_1"] = conv_params(wx)
    params["Conv2d_2"] = conv_params(psi_conv)
    got = mod.apply(
        {"params": params, "batch_stats": init["batch_stats"]},
        jnp.asarray(g), jnp.asarray(x), False,
    )
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-4, atol=1e-5)


def test_recurrent_block_applies_conv_t_plus_1_times():
    """The reference loop runs the shared conv t+1 times (unet_parts.py:125-132).
    With BN in eval mode (identity at fresh stats) and ReLU, verify against a
    direct t+1 unroll."""
    ch, t = 3, 2
    mod = B.RecurrentBlock(ch, t)
    x = jnp.asarray(np.random.RandomState(3).rand(1, 4, 4, ch), jnp.float32)
    variables = mod.init(jax.random.PRNGKey(0), x, False)
    got = mod.apply(variables, x, False)

    kernel = variables["params"]["Conv2d_0"]["conv"]["kernel"]
    bias = variables["params"]["Conv2d_0"]["conv"]["bias"]

    def conv(v):
        out = jax.lax.conv_general_dilated(
            v, kernel, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        return jax.nn.relu(out)  # eval-mode fresh BN == identity

    x1 = conv(x)
    for _ in range(t):
        x1 = conv(x + x1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x1), rtol=1e-4, atol=1e-5)


def test_mhsa_matches_torch_multihead():
    """Packed-QKV self-attention == torch nn.MultiheadAttention(batch_first)
    (RetinaLiteNet.py:72-80)."""
    torch.manual_seed(4)
    e, h, L = 16, 4, 9
    tmha = nn.MultiheadAttention(e, h, batch_first=True)
    tmha.eval()
    rng = np.random.RandomState(5)
    x = rng.randn(2, L, e).astype(np.float32)
    with torch.no_grad():
        want, _ = tmha(torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x))

    mod = B.MultiHeadSelfAttention(e, h)
    params = {
        "in_proj": {
            "kernel": jnp.asarray(tmha.in_proj_weight.detach().numpy().T),
            "bias": jnp.asarray(tmha.in_proj_bias.detach().numpy()),
        },
        "out_proj": {
            "kernel": jnp.asarray(tmha.out_proj.weight.detach().numpy().T),
            "bias": jnp.asarray(tmha.out_proj.bias.detach().numpy()),
        },
    }
    got = mod.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want.numpy(), rtol=1e-4, atol=1e-5)


def test_double_conv_matches_torch():
    """(Conv3x3 no-bias -> BN -> ReLU) x2 in train mode (batch stats),
    unet_parts.py:17-34."""
    torch.manual_seed(6)
    c1 = nn.Conv2d(3, 8, 3, padding=1, bias=False)
    b1 = nn.BatchNorm2d(8)
    c2 = nn.Conv2d(8, 8, 3, padding=1, bias=False)
    b2 = nn.BatchNorm2d(8)
    for m in (b1, b2):
        m.train()
    rng = np.random.RandomState(7)
    x = rng.randn(2, 6, 6, 3).astype(np.float32)
    want = F.relu(b2(c2(F.relu(b1(c1(_nchw(x)))))))

    mod = B.DoubleConv(3, 8)
    init = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), False)
    params = jax.tree.map(np.asarray, init["params"])
    params["Conv2d_0"] = conv_params(c1)
    params["Conv2d_1"] = conv_params(c2)
    got, _ = mod.apply(
        {"params": params, "batch_stats": init["batch_stats"]},
        jnp.asarray(x), True, mutable=["batch_stats"],
    )
    np.testing.assert_allclose(np.asarray(got), _nhwc(want), rtol=1e-3, atol=1e-4)


def test_respath_double_bn_quirk_matches_torch():
    """Respath applies the SAME BatchNorm twice per iteration
    (unet_parts.py:784-788: self.bns[i] is used after the conv AND after
    the residual add).  Torch oracle in eval mode, length-2 path, weights
    transplanted — pins the double application and the relu/add ordering."""
    torch.manual_seed(7)
    rng = np.random.RandomState(8)
    C = 8

    def bn_params():
        return dict(
            weight=torch.from_numpy(rng.rand(C).astype(np.float32) + 0.5),
            bias=torch.from_numpy((rng.randn(C) * 0.1).astype(np.float32)),
            mean=torch.from_numpy((rng.randn(C) * 0.2).astype(np.float32)),
            var=torch.from_numpy(rng.rand(C).astype(np.float32) + 0.5),
        )

    def conv_params_t(k):
        w = torch.from_numpy(
            (rng.randn(C, C, k, k) * 0.2).astype(np.float32))
        b = torch.from_numpy((rng.randn(C) * 0.05).astype(np.float32))
        return w, b

    iters = []
    for _ in range(2):
        iters.append(dict(
            sc=conv_params_t(1), sc_bn=bn_params(),
            cv=conv_params_t(3), cv_bn=bn_params(),
            dbl_bn=bn_params(),  # the shared, twice-applied BN
        ))

    def bn_eval(v, p):
        return F.batch_norm(v, p["mean"], p["var"], p["weight"], p["bias"],
                            training=False)

    x_np = rng.rand(2, 8, 8, C).astype(np.float32)
    v = _nchw(x_np)
    for it in iters:
        shortcut = bn_eval(F.conv2d(v, *it["sc"]), it["sc_bn"])  # Conv2d_batchnorm act=None
        v = F.relu(bn_eval(F.conv2d(v, *it["cv"], padding=1), it["cv_bn"]))
        v = F.relu(bn_eval(v, it["dbl_bn"]))      # first application
        v = v + shortcut
        v = F.relu(bn_eval(v, it["dbl_bn"]))      # second application (quirk)
    want = _nhwc(v)

    def conv_flax(w, b):
        return {"conv": {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b.numpy())}}

    def bn_flax(p):
        return ({"bn": {"scale": jnp.asarray(p["weight"].numpy()),
                        "bias": jnp.asarray(p["bias"].numpy())}},
                {"bn": {"mean": jnp.asarray(p["mean"].numpy()),
                        "var": jnp.asarray(p["var"].numpy())}})

    params, stats = {}, {}
    for i, it in enumerate(iters):
        pb, sb = bn_flax(it["sc_bn"])
        params[f"shortcut_{i}"] = {"Conv2d_0": conv_flax(*it["sc"]),
                                   "BatchNorm2d_0": pb}
        stats[f"shortcut_{i}"] = {"BatchNorm2d_0": sb}
        pb, sb = bn_flax(it["cv_bn"])
        params[f"conv_{i}"] = {"Conv2d_0": conv_flax(*it["cv"]),
                               "BatchNorm2d_0": pb}
        stats[f"conv_{i}"] = {"BatchNorm2d_0": sb}
        pb, sb = bn_flax(it["dbl_bn"])
        params[f"bn_{i}"] = pb
        stats[f"bn_{i}"] = sb

    mod = B.Respath(C, C, 2)
    got = mod.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x_np), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_multiresblock_matches_torch():
    """Multiresblock transplant parity — pins the chained 3x3 convs, the
    concat([a,b,c]) order, the int()-truncated channel split (4/8/13 for
    W=16*1.67) and the BN -> +shortcut -> BN -> relu tail
    (unet_parts.py:659-715).  Eval mode."""
    rng = np.random.RandomState(11)
    cin, filt, alpha = 8, 16, 1.67
    W = filt * alpha
    f3, f5, f7 = int(W * 0.167), int(W * 0.333), int(W * 0.5)
    out_f = f3 + f5 + f7

    def convb(ci, co, k):
        w = torch.from_numpy((rng.randn(co, ci, k, k)
                              / np.sqrt(ci * k * k)).astype(np.float32))
        b = torch.from_numpy((rng.randn(co) * .05).astype(np.float32))
        return w, b

    def bnp(c):
        return dict(
            weight=torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5),
            bias=torch.from_numpy((rng.randn(c) * 0.1).astype(np.float32)),
            mean=torch.from_numpy((rng.randn(c) * 0.2).astype(np.float32)),
            var=torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))

    def bn_eval(v, p):
        return F.batch_norm(v, p["mean"], p["var"], p["weight"], p["bias"],
                            training=False)

    sc = (convb(cin, out_f, 1), bnp(out_f))       # shortcut, act None
    c3 = (convb(cin, f3, 3), bnp(f3))             # relu
    c5 = (convb(f3, f5, 3), bnp(f5))              # relu
    c7 = (convb(f5, f7, 3), bnp(f7))              # relu
    bn1, bn2 = bnp(out_f), bnp(out_f)

    x_np = rng.rand(2, 8, 8, cin).astype(np.float32)
    v = _nchw(x_np)
    shrtct = bn_eval(F.conv2d(v, *sc[0]), sc[1])
    a = F.relu(bn_eval(F.conv2d(v, *c3[0], padding=1), c3[1]))
    bb = F.relu(bn_eval(F.conv2d(a, *c5[0], padding=1), c5[1]))
    cc = F.relu(bn_eval(F.conv2d(bb, *c7[0], padding=1), c7[1]))
    y = torch.cat([a, bb, cc], dim=1)
    y = bn_eval(y, bn1)
    y = y + shrtct
    y = F.relu(bn_eval(y, bn2))
    want = _nhwc(y)

    def conv_flax(wb):
        w, b = wb
        return {"conv": {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0)),
                         "bias": jnp.asarray(b.numpy())}}

    def bn_flax(p):
        return ({"bn": {"scale": jnp.asarray(p["weight"].numpy()),
                        "bias": jnp.asarray(p["bias"].numpy())}},
                {"bn": {"mean": jnp.asarray(p["mean"].numpy()),
                        "var": jnp.asarray(p["var"].numpy())}})

    params, stats = {}, {}
    for i, (wb, bn) in enumerate((sc, c3, c5, c7)):
        pb, sb = bn_flax(bn)
        params[f"Conv2dBatchnorm_{i}"] = {"Conv2d_0": conv_flax(wb),
                                          "BatchNorm2d_0": pb}
        stats[f"Conv2dBatchnorm_{i}"] = {"BatchNorm2d_0": sb}
    for i, bn in enumerate((bn1, bn2)):
        pb, sb = bn_flax(bn)
        params[f"BatchNorm2d_{i}"] = pb
        stats[f"BatchNorm2d_{i}"] = sb

    mod = B.Multiresblock(cin, filt, alpha)
    got = mod.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x_np), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_babasicblock_matches_torch():
    """BABasicBlock transplant parity — pins the BA fusion order
    (cur-fusion from post-conv2 GAP, pre-fusion from post-conv1 GAP,
    summed -> relu -> linear -> sigmoid gate), the gate application point,
    and the 1x1-conv residual (unet_parts.py:227-275).  Eval mode
    (dropout identity)."""
    rng = np.random.RandomState(12)
    cin, cout, red = 8, 16, 4  # reduction=4 so cout//red = 4

    def convw(ci, co, k):
        return torch.from_numpy((rng.randn(co, ci, k, k)
                                 / np.sqrt(ci * k * k)).astype(np.float32))

    def bnp(c):
        return dict(
            weight=torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5),
            bias=torch.from_numpy((rng.randn(c) * 0.1).astype(np.float32)),
            mean=torch.from_numpy((rng.randn(c) * 0.2).astype(np.float32)),
            var=torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))

    def bn_eval(v, p):
        return F.batch_norm(v, p["mean"], p["var"], p["weight"], p["bias"],
                            training=False)

    w1, bn1 = convw(cin, cout, 3), bnp(cout)
    w2, bn2 = convw(cout, cout, 3), bnp(cout)
    w3 = convw(cin, cout, 1)
    lin_cur = torch.from_numpy((rng.randn(red, cout) / np.sqrt(cout)
                                ).astype(np.float32))
    bn_cur = bnp(red)
    lin_pre = torch.from_numpy((rng.randn(red, cout) / np.sqrt(cout)
                                ).astype(np.float32))
    bn_pre = bnp(red)
    lin_gen = torch.from_numpy((rng.randn(cout, red) / np.sqrt(red)
                                ).astype(np.float32))

    x_np = rng.rand(2, 8, 8, cin).astype(np.float32)
    v = _nchw(x_np)
    out = F.relu(bn_eval(F.conv2d(v, w1, padding=1), bn1))
    f1 = F.adaptive_avg_pool2d(out, 1)
    out = bn_eval(F.conv2d(out, w2, padding=1), bn2)
    f2 = F.adaptive_avg_pool2d(out, 1)
    # BN1d on (B, red)
    def bn1d(v, p):
        return (v - p["mean"]) / torch.sqrt(p["var"] + 1e-5) * p["weight"] + p["bias"]
    fusion = bn1d(f2.flatten(1) @ lin_cur.T, bn_cur) + \
             bn1d(f1.flatten(1) @ lin_pre.T, bn_pre)
    att = torch.sigmoid(F.relu(fusion) @ lin_gen.T).unsqueeze(-1).unsqueeze(-1)
    out = out * att
    residual = F.conv2d(v, w3)  # dropout identity in eval
    want = _nhwc(F.relu(out + residual))

    def conv_flax(w):
        return {"conv": {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0))}}

    def bn_flax(p):
        return ({"bn": {"scale": jnp.asarray(p["weight"].numpy()),
                        "bias": jnp.asarray(p["bias"].numpy())}},
                {"bn": {"mean": jnp.asarray(p["mean"].numpy()),
                        "var": jnp.asarray(p["var"].numpy())}})

    p1, s1 = bn_flax(bn1)
    p2, s2 = bn_flax(bn2)
    pc, sc_ = bn_flax(bn_cur)
    pp, sp = bn_flax(bn_pre)
    params = {
        "Conv2d_0": conv_flax(w1), "BatchNorm2d_0": p1,
        "Conv2d_1": conv_flax(w2), "BatchNorm2d_1": p2,
        "Conv2d_2": conv_flax(w3),
        "BAModule_0": {
            "Linear_0": {"linear": {"kernel": jnp.asarray(lin_cur.numpy().T)}},
            "BatchNorm1d_0": pc,
            "Linear_1": {"linear": {"kernel": jnp.asarray(lin_pre.numpy().T)}},
            "BatchNorm1d_1": pp,
            "Linear_2": {"linear": {"kernel": jnp.asarray(lin_gen.numpy().T)}},
        },
    }
    stats = {"BatchNorm2d_0": s1, "BatchNorm2d_1": s2,
             "BAModule_0": {"BatchNorm1d_0": sc_, "BatchNorm1d_1": sp}}

    mod = B.BABasicBlock(cin, cout, reduction=red)
    got = mod.apply({"params": params, "batch_stats": stats},
                    jnp.asarray(x_np), False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_frblock_matches_torch():
    """FRUNet grid-node parity — pins the feature_fuse 3-conv summation
    (1x1 + 3x3 + dilated-3x3 d=2), LeakyReLU(0.1) slopes, the FRConv
    out_c->out_c quirk, and the up/down branch semantics
    (unet_parts.py:490-591).  Eval mode (Dropout2d identity)."""
    rng = np.random.RandomState(13)
    cin, cout = 4, 8

    def convw(ci, co, k):
        return torch.from_numpy((rng.randn(co, ci, k, k)
                                 / np.sqrt(ci * k * k)).astype(np.float32))

    def bnp(c):
        return dict(
            weight=torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5),
            bias=torch.from_numpy((rng.randn(c) * 0.1).astype(np.float32)),
            mean=torch.from_numpy((rng.randn(c) * 0.2).astype(np.float32)),
            var=torch.from_numpy(rng.rand(c).astype(np.float32) + 0.5))

    def bn_eval(v, p):
        return F.batch_norm(v, p["mean"], p["var"], p["weight"], p["bias"],
                            training=False)

    ff = {"w11": convw(cin, cout, 1), "w33": convw(cin, cout, 3),
          "wdi": convw(cin, cout, 3), "bn": bnp(cout)}
    fc = [(convw(cout, cout, 3), bnp(cout)) for _ in range(2)]
    up_w = torch.from_numpy((rng.randn(cout, cout // 2, 2, 2)
                             / np.sqrt(cout * 2)).astype(np.float32))
    up_bn = bnp(cout // 2)
    down_w = convw(cout, cout * 2, 2)
    down_bn = bnp(cout * 2)

    x_np = rng.rand(2, 8, 8, cin).astype(np.float32)
    v = _nchw(x_np)
    # feature_fuse (in_c != out_c)
    fused = bn_eval(F.conv2d(v, ff["w11"]) + F.conv2d(v, ff["w33"], padding=1)
                    + F.conv2d(v, ff["wdi"], padding=2, dilation=2), ff["bn"])
    h = fused
    for w, bn in fc:
        h = F.leaky_relu(bn_eval(F.conv2d(h, w, padding=1), bn), 0.1)
    up = F.leaky_relu(bn_eval(F.conv_transpose2d(h, up_w, stride=2), up_bn), 0.1)
    down = F.leaky_relu(bn_eval(F.conv2d(h, down_w, stride=2), down_bn), 0.1)
    want = (_nhwc(h), _nhwc(up), _nhwc(down))

    def conv_flax(w):
        return {"conv": {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0))}}

    def bn_flax(p):
        return ({"bn": {"scale": jnp.asarray(p["weight"].numpy()),
                        "bias": jnp.asarray(p["bias"].numpy())}},
                {"bn": {"mean": jnp.asarray(p["mean"].numpy()),
                        "var": jnp.asarray(p["var"].numpy())}})

    ffp, ffs = bn_flax(ff["bn"])
    c0p, c0s = bn_flax(fc[0][1])
    c1p, c1s = bn_flax(fc[1][1])
    upp, ups_ = bn_flax(up_bn)
    dnp_, dns = bn_flax(down_bn)
    up_k = up_w.numpy().transpose(2, 3, 0, 1)[::-1, ::-1].copy()
    params = {
        "FeatureFuse_0": {"Conv2d_0": conv_flax(ff["w11"]),
                          "Conv2d_1": conv_flax(ff["w33"]),
                          "Conv2d_2": conv_flax(ff["wdi"]),
                          "BatchNorm2d_0": ffp},
        "FRConv_0": {"Conv2d_0": conv_flax(fc[0][0]),
                     "BatchNorm2d_0": c0p,
                     "Conv2d_1": conv_flax(fc[1][0]),
                     "BatchNorm2d_1": c1p},
        "FRUp_0": {"ConvTranspose2d_0": {"conv": {"kernel": jnp.asarray(up_k)}},
                   "BatchNorm2d_0": upp},
        "FRDown_0": {"Conv2d_0": conv_flax(down_w), "BatchNorm2d_0": dnp_},
    }
    stats = {
        "FeatureFuse_0": {"BatchNorm2d_0": ffs},
        "FRConv_0": {"BatchNorm2d_0": c0s, "BatchNorm2d_1": c1s},
        "FRUp_0": {"BatchNorm2d_0": ups_},
        "FRDown_0": {"BatchNorm2d_0": dns},
    }
    mod = B.FRBlock(cin, cout, dp=0.0, is_up=True, is_down=True, fuse=True)
    got_h, got_up, got_down = mod.apply(
        {"params": params, "batch_stats": stats}, jnp.asarray(x_np), False)
    np.testing.assert_allclose(np.asarray(got_h), want[0], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_up), want[1], rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(got_down), want[2], rtol=1e-4, atol=1e-5)
