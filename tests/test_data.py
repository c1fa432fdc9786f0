"""Data pipeline tests: sample-map semantics, on-device patch extraction,
h5 schema roundtrip, preprocessing enhancements."""

import h5py
import jax
import jax.numpy as jnp
import numpy as np

from jcfszxc_unet_tpu.data import preprocess as P
from jcfszxc_unet_tpu.data import sampler as S


class TestTrainSampleMap:
    def test_filters_borders_and_zero_mask(self):
        masks = np.zeros((2, 20, 16), np.float32)
        masks[0, 5, 7] = 1.0    # valid for half_patch <= 5
        masks[0, 1, 7] = 1.0    # too close to top
        masks[1, 10, 15] = 1.0  # too close to right (y=15, W=16, half=4 -> 15 >= 12)
        m = S.build_train_sample_map(masks, half_patch=4)
        assert m.shape == (1, 3)
        assert tuple(m[0]) == (0, 5, 7)

    def test_matches_reference_formula(self):
        rng = np.random.RandomState(0)
        masks = (rng.rand(3, 30, 25) > 0.5).astype(np.float32)
        half = 6
        m = S.build_train_sample_map(masks, half)
        ii, xx, yy = np.nonzero(masks != 0)
        valid = ((xx >= half) & (xx < 30 - half) & (yy >= half) & (yy < 25 - half))
        assert m.shape[0] == valid.sum()
        # all sampled patches stay in-bounds
        assert (m[:, 1] - half >= 0).all() and (m[:, 1] + half <= 30).all()
        assert (m[:, 2] - half >= 0).all() and (m[:, 2] + half <= 25).all()


class TestGridSampleMap:
    def test_reference_geometry_584x565(self):
        # DRIVE images, patch 512: centers clipped into the valid interior
        m = S.build_grid_sample_map(20, 584, 565, 256)
        xs = np.unique(m[:, 1])
        ys = np.unique(m[:, 2])
        np.testing.assert_array_equal(xs, [256, 328])
        np.testing.assert_array_equal(ys, [256, 309])
        assert m.shape == (20 * 2 * 2, 3)

    def test_half_overlap_geometry(self):
        m = S.build_grid_sample_map(1, 128, 128, 32)
        # arange(32,128,32) = 32,64,96 -> clip to [32,96]
        np.testing.assert_array_equal(np.unique(m[:, 1]), [32, 64, 96])


class TestExtractPatches:
    def test_matches_numpy_slicing(self):
        rng = np.random.RandomState(1)
        pool = rng.rand(3, 40, 32, 2).astype(np.float32)
        centers = np.array([[0, 10, 10], [2, 30, 20], [1, 8, 8]], np.int32)
        got = S.extract_patches(jnp.asarray(pool), jnp.asarray(centers), 16)
        for k, (i, x, y) in enumerate(centers):
            want = pool[i, x - 8 : x + 8, y - 8 : y + 8, :]
            np.testing.assert_allclose(np.asarray(got[k]), want)

    def test_sampling_deterministic_per_key(self):
        rng = np.random.RandomState(2)
        pool = jnp.asarray(rng.rand(2, 30, 30, 1), jnp.float32)
        smap = jnp.asarray(S.build_train_sample_map(np.ones((2, 30, 30), np.float32), 5))
        key = jax.random.PRNGKey(7)
        a1, _ = S.sample_batch(key, pool, pool, smap, 8, 10)
        a2, _ = S.sample_batch(key, pool, pool, smap, 8, 10)
        np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
        b, _ = S.sample_batch(jax.random.PRNGKey(8), pool, pool, smap, 8, 10)
        assert not np.array_equal(np.asarray(a1), np.asarray(b))


class TestH5Schema:
    def test_roundtrip_and_keys(self, tmp_path):
        ds = {
            "images": np.random.rand(2, 8, 6, 3).astype(np.float32),
            "masks": np.random.rand(2, 8, 6).astype(np.float32),
            "labels": np.random.rand(2, 8, 6).astype(np.float32),
            "filenames": ["a.tif", "b.tif"],
        }
        path = P.save_data(ds, str(tmp_path), "split", "h5")
        with h5py.File(path, "r") as f:
            assert set(f.keys()) == {"images", "masks", "labels", "filenames"}
        back = P.load_preprocessed_data(path)
        np.testing.assert_allclose(back["images"], ds["images"])
        assert back["filenames"] == ds["filenames"]

    def test_pickle_roundtrip(self, tmp_path):
        ds = {
            "images": np.zeros((1, 4, 4, 3), np.float32),
            "masks": np.zeros((1, 4, 4), np.float32),
            "labels": np.zeros((1, 4, 4), np.float32),
            "filenames": ["x.tif"],
        }
        path = P.save_data(ds, str(tmp_path), "split", "pickle")
        back = P.load_preprocessed_data(path)
        assert back["filenames"] == ["x.tif"]


class TestEnhancements:
    def test_identity_by_default(self):
        img = np.random.rand(6, 5, 3).astype(np.float32)
        np.testing.assert_array_equal(P.enhance_image(img), img)

    def test_gamma(self):
        img = np.full((4, 4, 3), 0.25, np.float32)
        out = P.enhance_image(img, gamma=2.0)
        np.testing.assert_allclose(out, 0.0625, rtol=1e-6)

    def test_clahe_improves_contrast(self):
        rng = np.random.RandomState(3)
        # low-contrast image squeezed into [0.4, 0.6]
        img = (rng.rand(64, 64).astype(np.float32) * 0.2 + 0.4)
        out = P.clahe(img)
        assert out.shape == img.shape
        assert out.std() > img.std()
        assert out.min() >= 0.0 and out.max() <= 1.0

    def test_grayscale_replicates_channels(self):
        img = np.random.rand(5, 5, 3).astype(np.float32)
        out = P.enhance_image(img, grayscale=True)
        assert out.shape == (5, 5, 3)
        np.testing.assert_allclose(out[..., 0], out[..., 1])


class TestAugmentBatch:
    @staticmethod
    def _dihedral8(x):
        """All 8 flip/rotation transforms of one (P, P, C) patch."""
        out = []
        for t in (False, True):
            base = np.swapaxes(x, 0, 1) if t else x
            for h in (False, True):
                for v in (False, True):
                    y = base[:, ::-1] if h else base
                    y = y[::-1] if v else y
                    out.append(y)
        return out

    def test_image_and_label_get_the_same_transform(self):
        rng = np.random.RandomState(0)
        imgs = rng.rand(16, 8, 8, 3).astype(np.float32)
        labs = rng.rand(16, 8, 8, 1).astype(np.float32)
        ai, al = S.augment_batch(jax.random.PRNGKey(3), jnp.asarray(imgs),
                                 jnp.asarray(labs))
        ai, al = np.asarray(ai), np.asarray(al)
        seen = set()
        for b in range(16):
            cands_i = self._dihedral8(imgs[b])
            cands_l = self._dihedral8(labs[b])
            matches = [k for k, c in enumerate(cands_i)
                       if np.array_equal(ai[b], c)]
            assert matches, f"sample {b}: output is not a dihedral transform"
            # the label must have received one of the SAME group elements
            # (several k can alias on symmetric content, so check any match)
            assert any(np.array_equal(al[b], cands_l[k]) for k in matches)
            seen.add(matches[0])
        assert len(seen) > 2  # the batch actually mixes transforms

    def test_deterministic_per_key(self):
        rng = np.random.RandomState(1)
        imgs = jnp.asarray(rng.rand(4, 8, 8, 3).astype(np.float32))
        labs = jnp.asarray(rng.rand(4, 8, 8, 1).astype(np.float32))
        a1 = S.augment_batch(jax.random.PRNGKey(7), imgs, labs)
        a2 = S.augment_batch(jax.random.PRNGKey(7), imgs, labs)
        np.testing.assert_array_equal(np.asarray(a1[0]), np.asarray(a2[0]))
        np.testing.assert_array_equal(np.asarray(a1[1]), np.asarray(a2[1]))
