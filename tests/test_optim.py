"""Optimizer/scheduler parity: the optax chain vs torch.optim.RMSprop
(+clip), and the host-side plateau scheduler vs torch.ReduceLROnPlateau."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import torch

from jcfszxc_unet_tpu.train.optim import (
    ReduceLROnPlateau,
    get_current_lr,
    make_optimizer,
    set_current_lr,
)


class TestRMSpropParity:
    def test_matches_torch_rmsprop_with_clip(self):
        """Same params/grads through torch (clip_grad_norm_ then RMSprop with
        wd+momentum, the train.py:296-301 sequence) and the optax chain."""
        rng = np.random.RandomState(0)
        w0 = rng.randn(4, 3).astype(np.float32)
        lr, wd, mom = 1e-2, 1e-3, 0.9

        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        topt = torch.optim.RMSprop([tw], lr=lr, weight_decay=wd, momentum=mom)

        tx = make_optimizer(lr, weight_decay=wd, momentum=mom)
        params = {"w": jnp.asarray(w0)}
        opt_state = tx.init(params)

        for step in range(5):
            g = rng.randn(4, 3).astype(np.float32) * (3.0 if step == 2 else 0.5)
            # torch path
            tw.grad = torch.from_numpy(g.copy())
            torch.nn.utils.clip_grad_norm_([tw], 1.0)
            topt.step()
            # optax path (clip is inside the chain)
            grads = {"w": jnp.asarray(g)}
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            np.testing.assert_allclose(
                np.asarray(params["w"]), tw.detach().numpy(), rtol=1e-4, atol=1e-6,
                err_msg=f"divergence at step {step}",
            )

    def test_flatten_is_bit_exact_and_lr_mutable(self):
        """flatten=True (optax.flatten over the same chain) must be a pure
        layout change: identical updates across steps on a ragged pytree,
        with the injected LR still readable/mutable."""
        rng = np.random.RandomState(3)
        params = {
            "a": jnp.asarray(rng.randn(4, 3), jnp.float32),
            "b": {"w": jnp.asarray(rng.randn(7), jnp.float32),
                  "s": jnp.asarray([2.0], jnp.float32)},
        }
        tx = make_optimizer(1e-4)
        txf = make_optimizer(1e-4, flatten=True)
        st, stf = tx.init(params), txf.init(params)
        pa, pb = params, params
        for step in range(3):
            g = jax.tree.map(
                lambda p: p * 0.13 + 0.01 * (step + 1), pa)
            ua, st = tx.update(g, st, pa)
            ub, stf = txf.update(g, stf, pb)
            for x, y in zip(jax.tree.leaves(ua), jax.tree.leaves(ub)):
                np.testing.assert_array_equal(
                    np.asarray(x), np.asarray(y),
                    err_msg=f"flatten diverged at step {step}")
            pa = optax.apply_updates(pa, ua)
            pb = optax.apply_updates(pb, ub)
        # sq/mom state collapsed to flat vectors
        n = sum(x.size for x in jax.tree.leaves(params))
        flat_state_shapes = [x.shape for x in jax.tree.leaves(stf)]
        assert flat_state_shapes.count((n,)) == 2
        assert abs(get_current_lr(stf) - 1e-4) < 1e-10  # f32-stored LR
        stf = set_current_lr(stf, 5e-5)
        assert abs(get_current_lr(stf) - 5e-5) < 1e-10

    def test_flatten_through_production_train_step(self):
        """`make_optimizer(flatten=True)` must compose with the production
        train step (trainer.make_batch_step_fn) and reproduce the default
        per-leaf optimizer's trajectory exactly — same model, batches, and
        dropout keys; only the opt-state layout differs."""
        import flax.linen as nn

        from jcfszxc_unet_tpu.train.state import TrainState
        from jcfszxc_unet_tpu.train.trainer import make_batch_step_fn

        class Tiny(nn.Module):
            @nn.compact
            def __call__(self, x, train=False):
                x = nn.Conv(4, (3, 3))(x)
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9)(x)
                x = nn.relu(x)
                return nn.Conv(1, (1, 1))(x)

        model = Tiny()
        v = model.init({"params": jax.random.PRNGKey(0)},
                       jnp.zeros((1, 8, 8, 3), jnp.float32), train=False)

        def run(flatten):
            tx = make_optimizer(1e-3, weight_decay=1e-8, momentum=0.999,
                                flatten=flatten)
            state = TrainState(
                params=v["params"], batch_stats=v["batch_stats"],
                opt_state=tx.init(v["params"]),
                step=jnp.zeros((), jnp.int32))
            step = jax.jit(make_batch_step_fn(model, tx, n_classes=1))
            losses = []
            r = np.random.RandomState(11)
            for s in range(3):
                x = jnp.asarray(r.rand(2, 8, 8, 3), jnp.float32)
                y = jnp.asarray((r.rand(2, 8, 8, 1) > 0.5), jnp.float32)
                state, loss, ok = step(state, x, y, jax.random.PRNGKey(s))
                assert bool(ok)
                losses.append(float(loss))
            return state, losses

        s_a, l_a = run(False)
        s_b, l_b = run(True)
        assert l_a == l_b
        for a, b in zip(jax.tree.leaves(s_a.params),
                        jax.tree.leaves(s_b.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_lr_mutation_without_recompile(self):
        tx = make_optimizer(1e-3)
        params = {"w": jnp.ones((2,))}
        st = tx.init(params)
        assert abs(get_current_lr(st) - 1e-3) < 1e-9
        st = set_current_lr(st, 5e-4)
        assert abs(get_current_lr(st) - 5e-4) < 1e-9
        updates, st = tx.update({"w": jnp.ones((2,))}, st, params)
        assert np.isfinite(np.asarray(updates["w"])).all()


class TestPlateauScheduler:
    def _torch_sched(self, factor=0.7, patience=5, threshold=0.01, cooldown=2):
        p = torch.nn.Parameter(torch.zeros(1))
        opt = torch.optim.SGD([p], lr=1.0)
        sched = torch.optim.lr_scheduler.ReduceLROnPlateau(
            opt, mode="max", factor=factor, patience=patience,
            threshold=threshold, cooldown=cooldown,
        )
        return opt, sched

    def test_matches_torch_trace(self):
        metrics = [0.1, 0.2, 0.21, 0.21, 0.21, 0.21, 0.21, 0.21, 0.21, 0.21,
                   0.21, 0.21, 0.21, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5, 0.5,
                   0.5, 0.5]
        opt, tsched = self._torch_sched()
        ours = ReduceLROnPlateau()
        lr = 1.0
        for i, m in enumerate(metrics):
            tsched.step(m)
            lr = ours.step(m, lr)
            torch_lr = opt.param_groups[0]["lr"]
            assert abs(lr - torch_lr) < 1e-9, (i, lr, torch_lr)

    def test_improvement_during_cooldown_matches_torch(self):
        # torch consumes a cooldown epoch even when the metric improves; a
        # scheduler that only decrements on bad epochs stays in cooldown
        # forever here and delays the second reduction.
        metrics = [0.5] * 8          # trigger first reduction (patience=5)
        metrics += [0.6, 0.7]        # improvements *inside* the cooldown
        metrics += [0.7] * 8         # plateau again -> second reduction
        opt, tsched = self._torch_sched(patience=5, cooldown=2)
        ours = ReduceLROnPlateau(patience=5, cooldown=2)
        lr = 1.0
        for i, m in enumerate(metrics):
            tsched.step(m)
            lr = ours.step(m, lr)
            torch_lr = opt.param_groups[0]["lr"]
            assert abs(lr - torch_lr) < 1e-9, (i, lr, torch_lr)

    def test_fuzz_traces_match_torch(self):
        rng = np.random.RandomState(3)
        for trial in range(10):
            metrics = rng.uniform(0.0, 1.0, size=40)
            opt, tsched = self._torch_sched(patience=2, cooldown=1)
            ours = ReduceLROnPlateau(patience=2, cooldown=1)
            lr = 1.0
            for i, m in enumerate(metrics):
                tsched.step(float(m))
                lr = ours.step(float(m), lr)
                torch_lr = opt.param_groups[0]["lr"]
                assert abs(lr - torch_lr) < 1e-9, (trial, i, lr, torch_lr)

    def test_reduces_after_patience(self):
        ours = ReduceLROnPlateau(patience=2, cooldown=0)
        lr = 1.0
        lr = ours.step(0.5, lr)   # best
        for _ in range(2):
            lr = ours.step(0.5, lr)  # not better than best*(1.01)
        assert lr == 1.0
        lr = ours.step(0.5, lr)
        assert abs(lr - 0.7) < 1e-9
