"""MCUNet whole-model weight-transplant parity vs a torch functional
oracle — pins the model's unique dataflow: CBAM after every encoder stage,
the spatial-size-preserving InceptionA bottleneck, and Up_v1's NEGATIVE
pad (center crop) on the first decoder stage (models/MCUNet.py vs
reference MCUNet.py:46-61 / unet_parts.py:396-451).  Eval mode."""

import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

from jcfszxc_unet_tpu.models import create_model


class P:
    def __init__(self, seed):
        self.rng = np.random.RandomState(seed)

    def conv(self, cin, cout, k=3, bias=True):
        w = torch.from_numpy((self.rng.randn(cout, cin, k, k)
                              * (1.0 / np.sqrt(cin * k * k))).astype(np.float32))
        b = (torch.from_numpy((self.rng.randn(cout) * 0.05).astype(np.float32))
             if bias else None)
        return w, b

    def bn(self, c):
        return dict(
            weight=torch.from_numpy(self.rng.rand(c).astype(np.float32) + 0.5),
            bias=torch.from_numpy((self.rng.randn(c) * 0.1).astype(np.float32)),
            mean=torch.from_numpy((self.rng.randn(c) * 0.2).astype(np.float32)),
            var=torch.from_numpy(self.rng.rand(c).astype(np.float32) + 0.5),
        )


def bn_eval(v, p, eps=1e-5):
    return F.batch_norm(v, p["mean"], p["var"], p["weight"], p["bias"],
                        training=False, eps=eps)


def make_dc(p, cin, cout, mid=None):
    mid = mid or cout
    return {"w0": p.conv(cin, mid, bias=False), "bn0": p.bn(mid),
            "w1": p.conv(mid, cout, bias=False), "bn1": p.bn(cout)}


def dc_fwd(v, d):
    v = F.relu(bn_eval(F.conv2d(v, d["w0"][0], padding=1), d["bn0"]))
    return F.relu(bn_eval(F.conv2d(v, d["w1"][0], padding=1), d["bn1"]))


def make_cbam(p, c, ratio=16):
    return {"m0": p.conv(c, c // ratio, k=1, bias=False),
            "m1": p.conv(c // ratio, c, k=1, bias=False),
            "sp": p.conv(2, 1, k=7)}


def cbam_fwd(v, c):
    avg = F.adaptive_avg_pool2d(v, 1)
    mx = F.adaptive_max_pool2d(v, 1)

    def mlp(t):
        return F.conv2d(F.relu(F.conv2d(t, c["m0"][0])), c["m1"][0])

    v = torch.sigmoid(mlp(avg) + mlp(mx)) * v
    sa = torch.cat([v.mean(dim=1, keepdim=True),
                    v.max(dim=1, keepdim=True).values], dim=1)
    return torch.sigmoid(F.conv2d(sa, c["sp"][0], c["sp"][1], padding=3)) * v


def make_basic(p, cin, cout, k):
    return {"w": p.conv(cin, cout, k=k, bias=False), "bn": p.bn(cout), "k": k}


def basic_fwd(v, b):
    pad = 1 if b["k"] == 3 else 0
    return F.relu(bn_eval(F.conv2d(v, b["w"][0], padding=pad), b["bn"],
                          eps=1e-3))  # torchvision BasicConv2d eps


def test_mcunet_full_forward_matches_torch():
    p = P(4)
    c = 32
    in_conv = make_dc(p, 3, c)
    downs = [make_dc(p, c, 2 * c), make_dc(p, 2 * c, 4 * c),
             make_dc(p, 4 * c, 8 * c)]
    cbams = [make_cbam(p, c), make_cbam(p, 2 * c), make_cbam(p, 4 * c),
             make_cbam(p, 8 * c)]
    # InceptionA branches in flax ordering: b1_2, b2, b3_1, b3_2, b4_1, b4_2, b4_3
    inc = [make_basic(p, 256, 32, 1), make_basic(p, 256, 32, 1),
           make_basic(p, 256, 32, 1), make_basic(p, 32, 64, 3),
           make_basic(p, 256, 32, 1), make_basic(p, 32, 64, 3),
           make_basic(p, 64, 128, 3)]
    # Up_v1 bilinear: DoubleConv(in, out, mid=in//2)
    ups = [make_dc(p, 16 * c, 4 * c, mid=8 * c),
           make_dc(p, 8 * c, 2 * c, mid=4 * c),
           make_dc(p, 4 * c, c, mid=2 * c),
           make_dc(p, 2 * c, c, mid=c)]
    w_out = p.conv(c, 1, k=1)

    x_np = p.rng.rand(2, 32, 32, 3).astype(np.float32)
    v = torch.from_numpy(x_np).permute(0, 3, 1, 2)
    x1 = cbam_fwd(dc_fwd(v, in_conv), cbams[0])
    x2 = cbam_fwd(dc_fwd(F.max_pool2d(x1, 2), downs[0]), cbams[1])
    x3 = cbam_fwd(dc_fwd(F.max_pool2d(x2, 2), downs[1]), cbams[2])
    x4 = cbam_fwd(dc_fwd(F.max_pool2d(x3, 2), downs[2]), cbams[3])
    # InceptionA keeps spatial size
    y1 = basic_fwd(F.avg_pool2d(x4, 3, stride=1, padding=1), inc[0])
    y2 = basic_fwd(x4, inc[1])
    y3 = basic_fwd(basic_fwd(x4, inc[2]), inc[3])
    y4 = basic_fwd(basic_fwd(basic_fwd(x4, inc[4]), inc[5]), inc[6])
    x5 = torch.cat([y1, y2, y3, y4], dim=1)

    def up_v1(a, skip, d):
        a = F.interpolate(a, scale_factor=2, mode="bilinear", align_corners=True)
        dy = skip.shape[2] - a.shape[2]
        dx = skip.shape[3] - a.shape[3]
        a = F.pad(a, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
        return dc_fwd(torch.cat([skip, a], dim=1), d)

    h = up_v1(x5, x4, ups[0])   # negative pad -> crop
    h = up_v1(h, x3, ups[1])
    h = up_v1(h, x2, ups[2])
    h = up_v1(h, x1, ups[3])
    want = F.conv2d(h, w_out[0], w_out[1])
    want = want.permute(0, 2, 3, 1).detach().numpy()

    # ---- transplant ----
    def conv_flax(wb, bias=True):
        w, b = wb
        d = {"kernel": jnp.asarray(w.numpy().transpose(2, 3, 1, 0))}
        if bias and b is not None:
            d["bias"] = jnp.asarray(b.numpy())
        return {"conv": d}

    def bn_flax(bn):
        return ({"bn": {"scale": jnp.asarray(bn["weight"].numpy()),
                        "bias": jnp.asarray(bn["bias"].numpy())}},
                {"bn": {"mean": jnp.asarray(bn["mean"].numpy()),
                        "var": jnp.asarray(bn["var"].numpy())}})

    def dc_flax(d):
        prm, st = {}, {}
        for i in (0, 1):
            prm[f"Conv2d_{i}"] = conv_flax(d[f"w{i}"], bias=False)
            pb, sb = bn_flax(d[f"bn{i}"])
            prm[f"BatchNorm2d_{i}"] = pb
            st[f"BatchNorm2d_{i}"] = sb
        return prm, st

    params, stats = {}, {}
    params["in_conv"], stats["in_conv"] = dc_flax(in_conv)
    for i, d in enumerate(downs):
        prm, st = dc_flax(d)
        params[f"down{i + 1}"] = {"DoubleConv_0": prm}
        stats[f"down{i + 1}"] = {"DoubleConv_0": st}
    for i, cb in enumerate(cbams):
        params[f"cbam{i + 1}"] = {
            "ChannelAttentionModule_0": {
                "Conv2d_0": conv_flax(cb["m0"], bias=False),
                "Conv2d_1": conv_flax(cb["m1"], bias=False)},
            "SpatialAttentionModule_0": {"Conv2d_0": conv_flax(cb["sp"])},
        }
    d4p, d4s = {}, {}
    for i, b in enumerate(inc):
        d4p[f"BasicConv2d_{i}"] = {"Conv2d_0": conv_flax(b["w"], bias=False)}
        pb, sb = bn_flax(b["bn"])
        d4p[f"BasicConv2d_{i}"]["BatchNorm2d_0"] = pb
        d4s[f"BasicConv2d_{i}"] = {"BatchNorm2d_0": sb}
    params["down4"], stats["down4"] = d4p, d4s
    for i, d in enumerate(ups):
        prm, st = dc_flax(d)
        params[f"up{i + 1}"] = {"DoubleConv_0": prm}
        stats[f"up{i + 1}"] = {"DoubleConv_0": st}
    params["out_conv"] = {"Conv2d_0": conv_flax(w_out)}

    model = create_model("MCUNet.MCUNet")
    got = model.apply({"params": params, "batch_stats": stats},
                      jnp.asarray(x_np), train=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-3, atol=2e-4)
