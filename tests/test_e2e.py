"""End-to-end test: synthetic DRIVE dataset -> preprocess -> train (2
epochs) -> checkpoint -> evaluate.  The in-process equivalent of driving
the three CLIs (the project verify skill drives the real CLI surface)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from jcfszxc_unet_tpu.cli.evaluate import eval_model
from jcfszxc_unet_tpu.cli.train import train_model
from jcfszxc_unet_tpu.data.preprocess import (
    load_preprocessed_data,
    preprocess_dataset,
    process_data_subset,
)
from jcfszxc_unet_tpu.models import create_model
from jcfszxc_unet_tpu.train import checkpoint as ckpt


def _save_binary_gif(arr_u8, path):
    """Save a 0/255 uint8 array as a GIF that loads back as 0/255.

    PIL returns GIF rasters as palette *indices*; a plain save remaps the
    two used colors to indices {0,1}, which after the pipeline's /255
    normalization becomes 0.0039 — not the 1.0 that real DRIVE gifs
    yield.  Writing the raster AS the index array under an identity
    grayscale palette (optimize=False keeps PIL from remapping) makes
    the synthetic files behave like the real dataset."""
    from PIL import Image

    im = Image.fromarray(arr_u8, mode="P")
    im.putpalette([v for i in range(256) for v in (i, i, i)])
    im.save(path, optimize=False)


def make_synthetic_drive(root, n_train=4, n_test=2, h=64, w=48):
    """DRIVE-layout synthetic dataset (tif images, gif masks/labels)."""
    from PIL import Image

    rng = np.random.RandomState(0)
    for split, n in [("training", n_train), ("test", n_test)]:
        for d in ["images", "mask", "1st_manual"]:
            os.makedirs(os.path.join(root, split, d), exist_ok=True)
        for i in range(n):
            # Vessel-like random-walk labels, visible in the green channel
            # (like real fundus images) so short trainings can actually
            # learn the mapping instead of fitting noise.
            lab = np.zeros((h, w), np.uint8)
            y, x = h // 2, w // 2
            for _ in range(h * w // 2):
                lab[y, x] = 255
                y = int(np.clip(y + rng.randint(-2, 3), 1, h - 2))
                x = int(np.clip(x + rng.randint(-2, 3), 1, w - 2))
            img = (rng.rand(h, w, 3) * 128).astype(np.uint8)
            img[..., 1] = np.clip(
                img[..., 1].astype(np.int32) + (lab > 0) * 100, 0, 255
            ).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, split, "images", f"{20 + i}_{split}.tif")
            )
            mask = np.zeros((h, w), np.uint8)
            mask[4:-4, 4:-4] = 255
            _save_binary_gif(
                mask, os.path.join(root, split, "mask",
                                   f"{20 + i}_{split}_mask.gif")
            )
            _save_binary_gif(
                lab, os.path.join(root, split, "1st_manual",
                                  f"{20 + i}_manual1.gif")
            )


@pytest.fixture(scope="module")
def drive_h5(tmp_path_factory):
    root = tmp_path_factory.mktemp("drive")
    make_synthetic_drive(str(root / "raw"))
    info = preprocess_dataset(
        dataset_path=str(root / "raw"), output_dir=str(root / "data"),
        save_method="h5",
    )
    return info


class TestPreprocess:
    def test_layout_and_normalization(self, drive_h5):
        train = load_preprocessed_data(drive_h5["train"]["output_file"])
        assert train["images"].shape == (4, 64, 48, 3)
        assert train["images"].dtype == np.float32
        assert 0.0 <= train["images"].min() and train["images"].max() <= 1.0
        assert set(train.keys()) == {"images", "masks", "labels", "filenames"}
        # masks/labels binary 0/1 after /255, as real DRIVE gifs yield
        # (the generator writes identity-palette GIFs so PIL's
        # palette-index rasters carry the true 0/255 values)
        assert set(np.unique(train["masks"])) == {0.0, 1.0}
        assert set(np.unique(train["labels"])) == {0.0, 1.0}

    def test_filename_pairing(self, tmp_path):
        # mask/label filenames derive from the image stem
        make_synthetic_drive(str(tmp_path), n_train=1, n_test=1)
        ds = process_data_subset(str(tmp_path / "training"))
        assert ds["filenames"] == ["20_training.tif"]


class TestTrainEval:
    def test_full_loop(self, drive_h5, tmp_path):
        model = create_model("RetinaLiteNet.TransFuseNet")
        save_path = str(tmp_path / "best_model.ckpt")
        best = train_model(
            model=model,
            model_name="RetinaLiteNet.TransFuseNet",
            model_kwargs={},
            input_data=drive_h5["train"]["output_file"],
            steps=3,
            batch_size=4,
            patch_size=16,
            learning_rate=1e-3,
            val_percent=0.25,
            save_path=save_path,
            compute_dtype=jnp.float32,
            max_epochs=2,
            visualize=False,
            metrics_file=str(tmp_path / "metrics.jsonl"),
        )
        assert os.path.exists(save_path)
        assert 0.0 <= best <= 1.0

        import json

        rows = [json.loads(line)
                for line in open(tmp_path / "metrics.jsonl")]
        assert [r["epoch"] for r in rows] == [1, 2]
        assert all(np.isfinite(r["loss"]) and 0 <= r["dice"] <= 1
                   for r in rows)

        loaded_model, variables, cfg = ckpt.load_model(save_path)
        assert cfg["model_name"] == "RetinaLiteNet.TransFuseNet"
        mean_dice, per_image, mean_auc = eval_model(
            model=loaded_model,
            variables=variables,
            output_dir=str(tmp_path / "preds"),
            input_data=drive_h5["test"]["output_file"],
            patch_size=16,
            compute_dtype=jnp.float32,
            visualize=False,
        )
        assert len(per_image) == 2
        assert all(np.isfinite(d) for d in per_image)
        assert mean_auc is None or 0.0 <= mean_auc <= 1.0

    def test_checkpoint_roundtrip_exact(self, tmp_path):
        model = create_model("RetinaLiteNet.TransFuseNet")
        import jax

        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        path = str(tmp_path / "m.ckpt")
        ckpt.save_model(path, "RetinaLiteNet.TransFuseNet", {},
                        variables["params"], variables["batch_stats"])
        m2, v2, _ = ckpt.load_model(path)
        out1 = model.apply(variables, x, train=False)
        out2 = m2.apply(
            {"params": v2["params"], "batch_stats": v2["batch_stats"]},
            x, train=False,
        )
        np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))


class TestPredictor:
    def test_from_checkpoint_predicts(self, tmp_path):
        import jax

        from jcfszxc_unet_tpu.eval.predictor import Predictor

        model = create_model("RetinaLiteNet.TransFuseNet")
        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        path = str(tmp_path / "p.ckpt")
        ckpt.save_model(path, "RetinaLiteNet.TransFuseNet", {},
                        variables["params"], variables["batch_stats"])
        p = Predictor.from_checkpoint(path, compute_dtype=jnp.float32,
                                      patch_size=16, inference_batch_size=4)
        imgs = np.random.RandomState(0).rand(2, 48, 40, 3).astype(np.float32)
        probs = p.predict_images(imgs)
        assert probs.shape == (2, 48, 40)
        assert 0.0 <= float(probs.min()) and float(probs.max()) <= 1.0
        single = p.predict_full_image(imgs[0], patch_size=16, overlap=0.5)
        assert single.shape == (48, 40)

    def test_predictor_tta_matches_wrapper(self, tmp_path):
        """Predictor(tta=True) routes every protocol through dihedral_tta;
        spatial refuses (whole images are not square)."""
        import jax
        import pytest as _pytest

        from jcfszxc_unet_tpu.eval.predictor import Predictor
        from jcfszxc_unet_tpu.eval.tiling import dihedral_tta

        model = create_model("RetinaLiteNet.TransFuseNet")
        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        path = str(tmp_path / "p.ckpt")
        ckpt.save_model(path, "RetinaLiteNet.TransFuseNet", {},
                        variables["params"], variables["batch_stats"])
        p = Predictor.from_checkpoint(path, compute_dtype=jnp.float32,
                                      patch_size=16, tta=True)
        patches = jnp.asarray(
            np.random.RandomState(3).rand(2, 16, 16, 3), jnp.float32)
        plain = Predictor.from_checkpoint(path, compute_dtype=jnp.float32,
                                          patch_size=16)
        want = dihedral_tta(plain._forward)(patches)
        np.testing.assert_allclose(np.asarray(p.predict_patches(patches)),
                                   np.asarray(want), rtol=1e-5, atol=1e-6)
        with _pytest.raises(ValueError):
            p.predict_spatial(np.zeros((1, 32, 32, 3), np.float32))

    def test_predict_cli_image_files_to_maps(self, tmp_path, capsys):
        """jcfszxc-predict: plain image files -> probability + binary PNGs
        (the serving path the reference lacks — its evaluate.py reads only
        the preprocessed h5, evaluate.py:176-182)."""
        import jax
        from PIL import Image

        from jcfszxc_unet_tpu.cli.predict import get_args, predict_files

        model = create_model("RetinaLiteNet.TransFuseNet")
        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        path = str(tmp_path / "p.ckpt")
        ckpt.save_model(path, "RetinaLiteNet.TransFuseNet", {},
                        variables["params"], variables["batch_stats"])

        rng = np.random.RandomState(2)
        img_path = str(tmp_path / "eye.tif")
        Image.fromarray((rng.rand(48, 40, 3) * 255).astype(np.uint8)).save(img_path)
        gray_path = str(tmp_path / "gray.png")
        Image.fromarray((rng.rand(48, 40) * 255).astype(np.uint8)).save(gray_path)

        out = str(tmp_path / "out")
        maps = predict_files([img_path, gray_path], model_path=path,
                             output_dir=out, patch_size=16,
                             compute_dtype=jnp.float32)
        assert len(maps) == 2 and maps[0].shape == (48, 40)
        for stem in ["eye", "gray"]:
            assert os.path.exists(os.path.join(out, f"{stem}_prob.png"))
            assert os.path.exists(os.path.join(out, f"{stem}_mask.png"))
        binary = np.asarray(Image.open(os.path.join(out, "eye_mask.png")))
        assert set(np.unique(binary)).issubset({0, 255})

        # 16-bit TIFF (scanner output): normalized by its own range, so the
        # same content as uint8 and uint16 yields the same probabilities
        u8 = (rng.rand(48, 40) * 255).astype(np.uint8)
        p16_path = str(tmp_path / "deep.tif")
        Image.fromarray(u8.astype(np.uint16) * 257).save(p16_path)
        p8_path = str(tmp_path / "shallow.png")
        Image.fromarray(u8).save(p8_path)
        m16, m8 = predict_files([p16_path, p8_path], model_path=path,
                                output_dir=out, patch_size=16,
                                compute_dtype=jnp.float32)
        np.testing.assert_allclose(m16, m8, atol=1e-6)

        # spatial mode on a divisor-friendly size
        sq_path = str(tmp_path / "sq.tif")
        Image.fromarray((rng.rand(64, 64, 3) * 255).astype(np.uint8)).save(sq_path)
        maps_sp = predict_files([sq_path], model_path=path, output_dir=out,
                                mode="spatial", compute_dtype=jnp.float32)
        assert maps_sp[0].shape == (64, 64)

        # arg surface
        a = get_args(["a.tif", "b.tif", "-m", "m.ckpt", "--mode", "sliding"])
        assert a.inputs == ["a.tif", "b.tif"] and a.mode == "sliding"
        assert a.patch_size == 512 and a.threshold == 0.5

    def test_predict_spatial_matches_direct_forward(self, tmp_path):
        """predict_spatial (the --spatial fast path as an API) equals the
        direct whole-image forward when no padding is needed."""
        import jax

        from jcfszxc_unet_tpu.eval.predictor import Predictor

        model = create_model("RetinaLiteNet.TransFuseNet")
        x = jnp.zeros((1, 16, 16, 3))
        variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                               train=False)
        path = str(tmp_path / "p.ckpt")
        ckpt.save_model(path, "RetinaLiteNet.TransFuseNet", {},
                        variables["params"], variables["batch_stats"])
        p = Predictor.from_checkpoint(path, compute_dtype=jnp.float32,
                                      patch_size=16)
        imgs = np.random.RandomState(1).rand(2, 64, 64, 3).astype(np.float32)
        spat = np.asarray(p.predict_spatial(imgs))
        assert spat.shape == (2, 64, 64)
        want = np.asarray(jax.nn.sigmoid(
            p.model.apply(p.variables, jnp.asarray(imgs), train=False)
        ))[..., 0]
        np.testing.assert_allclose(spat, want, atol=1e-6, rtol=1e-6)
        assert p.predict_spatial(imgs).shape == (2, 64, 64)  # cached fwd


class TestExactResume:
    def test_full_state_roundtrip(self, drive_h5, tmp_path):
        """Train 2 epochs saving latest state; resume restores optimizer +
        scheduler + progress and continues from epoch 3."""
        model = create_model("RetinaLiteNet.TransFuseNet")
        latest = str(tmp_path / "latest.ckpt")
        train_model(
            model=model, model_name="RetinaLiteNet.TransFuseNet",
            model_kwargs={}, input_data=drive_h5["train"]["output_file"],
            steps=2, batch_size=4, patch_size=16, learning_rate=1e-3,
            val_percent=0.25, save_path=str(tmp_path / "best.ckpt"),
            compute_dtype=jnp.float32, max_epochs=2, visualize=False,
            latest_path=latest,
        )
        extra = ckpt.load_extra(latest)
        assert extra["progress"]["epoch"] == 2
        assert "opt_state" in extra

        # resume: loads params + optimizer + progress, runs one more epoch
        model2, variables, _ = ckpt.load_model(latest)
        train_model(
            model=model2, model_name="RetinaLiteNet.TransFuseNet",
            model_kwargs={}, input_data=drive_h5["train"]["output_file"],
            steps=2, batch_size=4, patch_size=16, learning_rate=1e-3,
            val_percent=0.25, save_path=str(tmp_path / "best2.ckpt"),
            compute_dtype=jnp.float32, max_epochs=3, visualize=False,
            latest_path=latest, resume_from=latest, init_variables=variables,
        )
        extra2 = ckpt.load_extra(latest)
        assert extra2["progress"]["epoch"] == 3


class TestExport:
    def test_export_roundtrip(self, tmp_path):
        import jax

        from jcfszxc_unet_tpu.eval.export import (export_forward,
                                                  load_exported)

        model = create_model("RetinaLiteNet.TransFuseNet")
        x = jnp.zeros((2, 16, 16, 3), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        blob = export_forward(model, variables, batch_size=2, patch_size=16,
                              compute_dtype=jnp.float32)
        assert isinstance(blob, (bytes, bytearray)) and len(blob) > 1000
        fn = load_exported(bytes(blob))
        rng = np.random.RandomState(0)
        xin = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
        got = fn(xin)
        want = jax.nn.sigmoid(model.apply(variables, xin, train=False))
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)

    def test_export_checkpoint_file_to_artifact(self, tmp_path):
        """Checkpoint-file -> serving-artifact path (export_checkpoint):
        the on-disk convenience wrapper serving deployments call."""
        import jax

        from jcfszxc_unet_tpu.eval.export import export_checkpoint, load_exported

        model = create_model("RetinaLiteNet.TransFuseNet")
        x = jnp.zeros((2, 16, 16, 3), jnp.float32)
        variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
        ckpt_path = str(tmp_path / "m.ckpt")
        ckpt.save_model(ckpt_path, "RetinaLiteNet.TransFuseNet", {},
                        variables["params"], variables.get("batch_stats", {}))
        out = export_checkpoint(ckpt_path, str(tmp_path / "m.hlo"),
                                batch_size=2, patch_size=16,
                                compute_dtype=jnp.float32)
        with open(out, "rb") as f:
            fn = load_exported(f.read())
        rng = np.random.RandomState(1)
        xin = jnp.asarray(rng.rand(2, 16, 16, 3), jnp.float32)
        loaded_model, lv, _ = ckpt.load_model(ckpt_path, dtype=jnp.float32)
        want = jax.nn.sigmoid(loaded_model.apply(lv, xin, train=False))
        np.testing.assert_allclose(np.asarray(fn(xin)), np.asarray(want),
                                   rtol=1e-5, atol=1e-6)


class TestSlidingWindowEval:
    def test_flags_drive_sliding_window_subset(self, drive_h5, tmp_path,
                                               monkeypatch, capsys):
        """--sliding-window + --overlap/--image-indices select the
        predict_full_image protocol (reference evaluate.py:28-96) on a
        subset of images — the flags the reference parses but never wires
        (evaluate.py:349-404)."""
        import jax

        monkeypatch.chdir(tmp_path)
        model = create_model("RetinaLiteNet.TransFuseNet")
        v = jax.jit(lambda r, x: model.init(r, x, True))(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        mean, per_image, auc = eval_model(
            model=model,
            variables={"params": v["params"],
                       "batch_stats": v.get("batch_stats", {})},
            input_data=drive_h5["test"]["output_file"],
            output_dir=str(tmp_path / "preds"),
            patch_size=32,
            inference_batch_size=4,
            visualize=False,
            sliding_window=True,
            overlap=0.75,
            image_indices=[1],
            full_metrics=True,
        )
        assert len(per_image) == 1  # subset honored
        assert 0.0 <= mean <= 1.0 and (auc is None or 0.0 <= auc <= 1.0)
        out = capsys.readouterr().out  # --full-metrics companion lines
        assert "Average Accuracy:" in out
        assert "Average Sensitivity:" in out and "Average Specificity:" in out

    def test_threshold_sweep_prints_dice_per_cut(self, drive_h5, tmp_path,
                                                 monkeypatch, capsys):
        """--threshold-sweep re-binarizes the computed probability maps
        across cuts and marks the best — the calibration diagnostic the
        --augment A/B motivated (experiments_record.md)."""
        import jax

        monkeypatch.chdir(tmp_path)
        model = create_model("RetinaLiteNet.TransFuseNet")
        v = jax.jit(lambda r, x: model.init(r, x, True))(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        eval_model(
            model=model,
            variables={"params": v["params"],
                       "batch_stats": v.get("batch_stats", {})},
            input_data=drive_h5["test"]["output_file"],
            output_dir=str(tmp_path / "preds"),
            patch_size=32,
            inference_batch_size=4,
            visualize=False,
            compute_auc=False,
            threshold_sweep=True,
        )
        out = capsys.readouterr().out
        assert "Threshold sweep (mean Dice):" in out
        assert out.count("threshold 0.") == 9 and "<- best" in out
        # --metrics-json companion: machine-readable mirror of stdout
        import json as _json

        mj = tmp_path / "metrics.json"
        eval_model(
            model=model,
            variables={"params": v["params"],
                       "batch_stats": v.get("batch_stats", {})},
            input_data=drive_h5["test"]["output_file"],
            output_dir=str(tmp_path / "preds"),
            patch_size=32,
            inference_batch_size=4,
            visualize=False,
            full_metrics=True,
            threshold_sweep=True,
            metrics_json=str(mj),
        )
        rec = _json.loads(mj.read_text())
        assert set(rec) >= {"mean_dice", "per_image_dice", "mean_auc",
                            "accuracy", "sensitivity", "specificity"}
        assert len(rec["per_image_dice"]) == rec["n_images"]
        sweep = rec["threshold_sweep"]
        assert len(sweep["rows"]) == 9
        assert sweep["best_dice"] == max(d for _, d in sweep["rows"])
        capsys.readouterr()
        # the headline metric still reflects the --threshold cut (0.5)
        line05 = [l for l in out.splitlines() if "threshold 0.50" in l][0]
        d05 = float(line05.split("Dice ")[1].split()[0])
        headline = [l for l in out.splitlines()
                    if l.startswith("Average Dice Score:")][0]
        assert abs(float(headline.split(":")[1]) - d05) < 5e-5


class TestSpatialEval:
    def test_spatial_flag_drives_whole_image_forward(self, drive_h5, tmp_path,
                                                     monkeypatch):
        """--spatial evaluates whole images with the H axis sharded over the
        mesh (parallel/spatial.py) — no patch grid, no stitching."""
        import jax

        from jcfszxc_unet_tpu.parallel.mesh import make_mesh

        monkeypatch.chdir(tmp_path)
        model = create_model("RetinaLiteNet.TransFuseNet")
        v = jax.jit(lambda r, x: model.init(r, x, True))(
            jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
        mean, per_image, auc = eval_model(
            model=model,
            variables={"params": v["params"],
                       "batch_stats": v.get("batch_stats", {})},
            input_data=drive_h5["test"]["output_file"],
            output_dir=str(tmp_path / "preds"),
            patch_size=32,
            inference_batch_size=4,
            visualize=False,
            spatial=True,
            mesh=make_mesh(2),
        )
        assert len(per_image) == 2
        assert 0.0 <= mean <= 1.0 and (auc is None or 0.0 <= auc <= 1.0)
