"""CLI contract tests: flags/defaults must match the reference's argparse
surfaces (train.py:419-487, evaluate.py:349-404, train-demo.py:667-735) so
reference users' invocations work unchanged."""

import importlib

from jcfszxc_unet_tpu.cli.evaluate import get_args as eval_args
from jcfszxc_unet_tpu.cli.preprocess import get_args as prep_args
from jcfszxc_unet_tpu.cli.train import get_args as train_args


class TestTrainArgs:
    def test_reference_defaults(self):
        a = train_args([])
        assert a.data_file == "./data/train_eye_dataset.h5"
        assert a.batch_size == 32
        assert a.lr == 1e-6
        assert a.load is False
        assert a.val == 10.0
        assert a.patch_size == 128
        assert a.steps == 100
        assert a.seed == 42
        assert a.early_stopping_patience == 20

    def test_reference_short_flags(self):
        a = train_args(["-d", "x.h5", "-b", "8", "-l", "1e-4", "-v", "25",
                        "-p", "64", "-s", "10", "-esp", "5", "-f", "m.ckpt"])
        assert a.data_file == "x.h5" and a.batch_size == 8
        assert a.lr == 1e-4 and a.val == 25.0 and a.patch_size == 64
        assert a.steps == 10 and a.early_stopping_patience == 5
        assert a.load == "m.ckpt"

    def test_additive_flags(self):
        a = train_args(["--model", "SegNet.SegNet", "--dtype", "float32",
                        "--devices", "4", "--remat"])
        assert a.model == "SegNet.SegNet"
        assert a.dtype == "float32" and a.devices == 4 and a.remat

    def test_s2d_flag(self):
        assert not train_args([]).s2d
        assert train_args(["--s2d"]).s2d
        assert not eval_args(["-m", "x.ckpt"]).s2d
        assert eval_args(["-m", "x.ckpt", "--s2d"]).s2d


class TestEvalArgs:
    def test_reference_defaults(self):
        a = eval_args([])
        assert a.model == "best_model.ckpt"
        assert a.data_file == "./data/test_eye_dataset.h5"
        assert a.output_dir == "./predictions"
        assert a.batch_size == 4
        assert a.patch_size == 512
        assert a.overlap == 0.5
        assert a.num_images == 5
        assert a.image_indices is None
        assert a.inference_batch_size == 32

    def test_short_flags(self):
        a = eval_args(["-m", "x.ckpt", "-o", "out", "-p", "256", "-n", "3",
                       "-i", "0,1"])
        assert a.model == "x.ckpt" and a.output_dir == "out"
        assert a.patch_size == 256 and a.num_images == 3
        assert a.image_indices == "0,1"


class TestTrainDemoArgs:
    def test_reference_defaults(self):
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "train_demo_cli", "/root/repo/train-demo.py"
        )
        m = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(m)
        a = m.get_args([])
        assert a.batch_size == 32 and a.lr == 1e-6 and a.patch_size == 128
        assert a.steps == 100 and a.early_stopping_patience == 20


class TestPreprocessArgs:
    def test_defaults(self):
        a = prep_args([])
        assert a.dataset_path == "../datasets/drive_eye/"
        assert a.output_dir == "data/"
        assert a.save_method == "h5"
        assert not a.grayscale and not a.clahe and a.gamma is None


class TestSaturationGuardrail:
    """bn_saturation_signature — the train CLI's warning that a collapsed
    val Dice is the BN running-stat saturation artifact, not model
    failure (VERDICT r3 item 8).  Trajectory values are the MEASURED
    SegNet convergence protocol (experiments_record.md round 3: val dice
    flaps 0.764<->0.000 while held-out AUC reads 0.934)."""

    def _sig(self, *a, **k):
        from jcfszxc_unet_tpu.cli.train import bn_saturation_signature

        return bn_saturation_signature(*a, **k)

    def test_fires_on_the_recorded_segnet_collapse(self):
        # epoch 1: 0.764 artifact-dice, epoch 2: collapse to 0.0 with the
        # val mean sigmoid output saturated near 0 (logits mean -844)
        assert self._sig([0.764, 0.0], mean_prob=0.001)

    def test_fires_on_each_reentry_but_not_on_flat_epochs(self):
        hist = [0.764, 0.0]
        assert self._sig(hist, mean_prob=0.0)
        hist.append(0.0)
        assert not self._sig(hist, mean_prob=0.0)  # still collapsed: quiet
        hist.append(0.764)
        assert not self._sig(hist, mean_prob=0.0)  # recovered: quiet
        hist.append(0.0)
        assert self._sig(hist, mean_prob=0.0)  # re-collapse: fires again

    def test_requires_a_prior_peak(self):
        # a model that never learned is not the saturation signature
        assert not self._sig([0.02, 0.01, 0.0], mean_prob=0.0)

    def test_mean_prob_gate_rejects_unsaturated_outputs(self):
        # dice collapse with mid-range outputs is some other failure
        assert not self._sig([0.764, 0.0], mean_prob=0.4)
        assert self._sig([0.764, 0.0], mean_prob=0.99)  # all-vessel side

    def test_quiet_on_healthy_and_short_histories(self):
        assert not self._sig([], mean_prob=0.5)
        assert not self._sig([0.0], mean_prob=0.0)
        assert not self._sig([0.4, 0.5, 0.6], mean_prob=0.4)
