"""Tiled-inference tests: stitch roundtrip identity on constant fields,
count-averaging of overlaps, sliding-window predictor, and AUC metric."""

import jax
import jax.numpy as jnp
import numpy as np

from jcfszxc_unet_tpu.data.sampler import build_grid_sample_map, extract_patches
from jcfszxc_unet_tpu.eval.metrics import roc_auc
from jcfszxc_unet_tpu.eval.tiling import (
    sliding_window_predict,
    stitch_patches,
    tiled_predict,
)


class TestStitch:
    def test_roundtrip_identity_on_constant_field(self):
        # tile a constant image and stitch: must reproduce it exactly
        # wherever the grid covers (full coverage at stride=half_patch
        # for these dims)
        n, h, w, patch = 2, 64, 64, 16
        field = np.full((n, h, w, 1), 0.7, np.float32)
        grid = build_grid_sample_map(n, h, w, patch // 2)
        centers = jnp.asarray(grid)
        patches = extract_patches(jnp.asarray(field), centers, patch)
        out = stitch_patches(jnp.squeeze(patches, -1), centers, n, h, w)
        np.testing.assert_allclose(np.asarray(out), 0.7, rtol=1e-6)

    def test_count_averaging(self):
        # two overlapping unit patches -> overlap area still 1.0 (averaged)
        centers = jnp.asarray(np.array([[0, 4, 4], [0, 4, 8]], np.int32))
        probs = jnp.ones((2, 8, 8))
        out = np.asarray(stitch_patches(probs, centers, 1, 16, 16))
        assert out.max() == 1.0
        covered = out > 0
        np.testing.assert_allclose(out[covered], 1.0)
        # uncovered corners stay 0
        assert out[0, 15, 15] == 0.0

    def test_varying_values_average(self):
        centers = jnp.asarray(np.array([[0, 4, 4], [0, 4, 4]], np.int32))
        probs = jnp.stack([jnp.zeros((8, 8)), jnp.ones((8, 8))])
        out = np.asarray(stitch_patches(probs, centers, 1, 8, 8))
        np.testing.assert_allclose(out[0:8, 0:8], 0.5)


class TestTiledPredict:
    def test_identity_model_reconstructs_channel_mean(self):
        rng = np.random.RandomState(0)
        images = jnp.asarray(rng.rand(2, 48, 40, 3), jnp.float32)

        def forward(batch):  # prob = mean over channels
            return jnp.mean(batch, axis=-1, keepdims=True)

        out = tiled_predict(forward, images, patch_size=16, inference_batch_size=4)
        want = np.asarray(jnp.mean(images, axis=-1))
        # grid covers the full image at these dims
        np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5, atol=1e-6)

    def test_sliding_window(self):
        rng = np.random.RandomState(1)
        image = jnp.asarray(rng.rand(40, 40, 3), jnp.float32)

        def forward(batch):
            return jnp.mean(batch, axis=-1, keepdims=True)

        out = sliding_window_predict(forward, image, patch_size=16, overlap=0.5)
        want = np.asarray(jnp.mean(image, axis=-1))
        # windows anchored top-left at stride 8: coverage reaches 40-16+8+16=40
        covered = np.zeros((40, 40), bool)
        for y in range(0, 40 - 16 + 1, 8):
            for x in range(0, 40 - 16 + 1, 8):
                covered[y : y + 16, x : x + 16] = True
        np.testing.assert_allclose(np.asarray(out)[covered], want[covered],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out)[~covered], 0.0)

    def test_patch_larger_than_image_raises(self):
        """Oversized patch vs image -> clear error, not an empty grid
        (tiled: ZeroDivisionError; sliding: silent all-zeros before)."""
        import pytest

        def forward(batch):
            return jnp.mean(batch, axis=-1, keepdims=True)

        images = jnp.zeros((1, 48, 40, 3), jnp.float32)
        with pytest.raises(ValueError, match="exceeds the image size"):
            tiled_predict(forward, images, patch_size=512)
        with pytest.raises(ValueError, match="exceeds the image size"):
            sliding_window_predict(forward, images[0], patch_size=512)


class TestAUC:
    def test_perfect_separation(self):
        scores = jnp.asarray([0.9, 0.8, 0.2, 0.1])
        targets = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        assert float(roc_auc(scores, targets)) > 0.99

    def test_random_is_half(self):
        rng = np.random.RandomState(2)
        scores = jnp.asarray(rng.rand(100000), jnp.float32)
        targets = jnp.asarray((rng.rand(100000) > 0.5), jnp.float32)
        assert abs(float(roc_auc(scores, targets)) - 0.5) < 0.01

    def test_matches_sklearn_formula(self):
        # exact rank-based AUC as oracle (no ties)
        rng = np.random.RandomState(3)
        scores = rng.rand(5000).astype(np.float32)
        targets = (rng.rand(5000) > 0.7).astype(np.float32)
        order = np.argsort(scores)
        ranks = np.empty_like(order, dtype=np.float64)
        ranks[order] = np.arange(1, len(scores) + 1)
        npos = targets.sum()
        nneg = len(targets) - npos
        want = (ranks[targets == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
        got = float(roc_auc(jnp.asarray(scores), jnp.asarray(targets)))
        assert abs(got - want) < 2e-3

    def test_mask_restricts(self):
        scores = jnp.asarray([0.9, 0.1, 0.5, 0.5])
        targets = jnp.asarray([1.0, 0.0, 1.0, 0.0])
        mask = jnp.asarray([1.0, 1.0, 0.0, 0.0])
        assert float(roc_auc(scores, targets, mask)) > 0.99

    def test_degenerate_returns_half(self):
        scores = jnp.asarray([0.5, 0.6])
        assert float(roc_auc(scores, jnp.asarray([1.0, 1.0]))) == 0.5


class TestDihedralTTA:
    def test_matches_numpy_oracle(self):
        """TTA of an orientation-sensitive forward equals the hand-rolled
        transform -> forward -> inverse-transform -> average loop."""
        from jcfszxc_unet_tpu.eval.tiling import dihedral_tta

        rng = np.random.RandomState(5)
        w = rng.rand(8, 8, 1).astype(np.float32)  # fixed asymmetric field

        def forward(x):  # (B,8,8,C) -> (B,8,8,1): content- AND position-dependent
            return x[..., :1] * 2.0 + jnp.asarray(w)

        x = rng.rand(3, 8, 8, 3).astype(np.float32)

        def np_transform(a, t, h, v):
            a = np.swapaxes(a, 1, 2) if t else a
            a = a[:, :, ::-1] if h else a
            return a[:, ::-1] if v else a

        acc = np.zeros((3, 8, 8, 1), np.float32)
        for t in (False, True):
            for h in (False, True):
                for v in (False, True):
                    xt = np_transform(x, t, h, v)
                    y = xt[..., :1] * 2.0 + w
                    # invert in reverse order (each factor is an involution)
                    y = y[:, ::-1] if v else y
                    y = y[:, :, ::-1] if h else y
                    y = np.swapaxes(y, 1, 2) if t else y
                    acc += y
        want = acc / 8.0

        got = np.asarray(dihedral_tta(forward)(jnp.asarray(x)))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_equivariant_forward_is_unchanged(self):
        """For a pointwise forward (commutes with every transform), TTA is
        the identity — pins that the inversions really undo the transforms."""
        from jcfszxc_unet_tpu.eval.tiling import dihedral_tta

        forward = lambda x: jax.nn.sigmoid(x[..., :1])  # noqa: E731
        x = jnp.asarray(np.random.RandomState(6).rand(2, 8, 8, 3), jnp.float32)
        np.testing.assert_allclose(np.asarray(dihedral_tta(forward)(x)),
                                   np.asarray(forward(x)), rtol=1e-6, atol=1e-7)


class TestClassificationMetrics:
    def test_matches_numpy_confusion(self):
        from jcfszxc_unet_tpu.eval.metrics import classification_metrics

        rng = np.random.RandomState(4)
        pred = (rng.rand(64, 64) > 0.6).astype(np.float32)
        target = (rng.rand(64, 64) > 0.7).astype(np.float32)
        mask = (rng.rand(64, 64) > 0.3).astype(np.float32)

        m = mask > 0
        tp = np.sum((pred == 1) & (target == 1) & m)
        fp = np.sum((pred == 1) & (target == 0) & m)
        fn = np.sum((pred == 0) & (target == 1) & m)
        tn = np.sum((pred == 0) & (target == 0) & m)

        acc, se, sp = classification_metrics(
            jnp.asarray(pred), jnp.asarray(target), jnp.asarray(mask))
        np.testing.assert_allclose(float(acc), (tp + tn) / m.sum(), rtol=1e-6)
        np.testing.assert_allclose(float(se), tp / (tp + fn), rtol=1e-6)
        np.testing.assert_allclose(float(sp), tn / (tn + fp), rtol=1e-6)

    def test_degenerate_zero_not_nan(self):
        from jcfszxc_unet_tpu.eval.metrics import classification_metrics

        # No positives: sensitivity denominator is 0 -> 0.0, not NaN.
        pred = jnp.zeros((4, 4))
        target = jnp.zeros((4, 4))
        acc, se, sp = classification_metrics(pred, target)
        assert float(acc) == 1.0 and float(se) == 0.0 and float(sp) == 1.0
        # Empty FOV: everything 0.0.
        acc, se, sp = classification_metrics(pred, target, jnp.zeros((4, 4)))
        assert float(acc) == 0.0 and float(se) == 0.0 and float(sp) == 0.0


class TestStitchScatterOracle:
    def test_matches_numpy_loop_oracle_random_overlaps(self):
        """The vectorized scatter-add stitch must equal the reference's
        python accumulation loop (evaluate.py:291-307) on random patches
        with irregular overlapping centers."""
        rng = np.random.RandomState(0)
        N, H, W, P = 3, 40, 36, 8
        half = P // 2
        centers = []
        for _ in range(25):
            img = rng.randint(0, N)
            cy = rng.randint(half, H - half + 1)
            cx = rng.randint(half, W - half + 1)
            centers.append((img, cy, cx))
        centers = np.array(centers, np.int32)
        probs = rng.rand(len(centers), P, P).astype(np.float32)

        canvas = np.zeros((N, H, W), np.float32)
        counts = np.zeros((N, H, W), np.float32)
        for k, (img, cy, cx) in enumerate(centers):
            canvas[img, cy - half:cy + half, cx - half:cx + half] += probs[k]
            counts[img, cy - half:cy + half, cx - half:cx + half] += 1.0
        want = np.where(counts > 0, canvas / np.maximum(counts, 1.0), 0.0)

        got = np.asarray(stitch_patches(jnp.asarray(probs),
                                        jnp.asarray(centers), N, H, W))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_scatter_variant_matches_loop(self):
        from jcfszxc_unet_tpu.eval.tiling import stitch_patches_scatter

        rng = np.random.RandomState(3)
        N, H, W, P = 2, 24, 20, 8
        half = P // 2
        centers = np.array(
            [(rng.randint(0, N), rng.randint(half, H - half + 1),
              rng.randint(half, W - half + 1)) for _ in range(15)], np.int32)
        probs = rng.rand(len(centers), P, P).astype(np.float32)
        a = np.asarray(stitch_patches(jnp.asarray(probs),
                                      jnp.asarray(centers), N, H, W))
        b = np.asarray(stitch_patches_scatter(jnp.asarray(probs),
                                              jnp.asarray(centers), N, H, W))
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)

    def test_scatter_variant_executes_sharded_on_mesh(self):
        """The scatter formulation's whole point is that it shards: run it
        with the patch axis actually split over the 8-device mesh (GSPMD
        scatters each shard's patches locally and all-reduces the canvas)
        and require single-device numbers."""
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as PS

        from jcfszxc_unet_tpu.eval.tiling import stitch_patches_scatter
        from jcfszxc_unet_tpu.parallel.mesh import make_mesh

        rng = np.random.RandomState(5)
        N, H, W, P = 2, 24, 20, 8
        half = P // 2
        centers = np.array(
            [(rng.randint(0, N), rng.randint(half, H - half + 1),
              rng.randint(half, W - half + 1)) for _ in range(24)], np.int32)
        probs = rng.rand(len(centers), P, P).astype(np.float32)

        mesh = make_mesh(8)
        probs_s = jax.device_put(
            jnp.asarray(probs), NamedSharding(mesh, PS("data", None, None)))
        centers_s = jax.device_put(
            jnp.asarray(centers), NamedSharding(mesh, PS("data", None)))
        assert len(probs_s.sharding.device_set) == 8  # really 8-way split

        got = stitch_patches_scatter(probs_s, centers_s, N, H, W)
        want = np.asarray(stitch_patches(jnp.asarray(probs),
                                         jnp.asarray(centers), N, H, W))
        np.testing.assert_allclose(np.asarray(got), want,
                                   rtol=1e-6, atol=1e-6)
