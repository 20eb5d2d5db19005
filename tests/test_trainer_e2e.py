"""Trainer end-to-end smoke: synthetic loaders, 1 epoch, checkpoint, resume."""

import glob
import json
import os

import numpy as np

from sfmnext_tpu.config import Options
from sfmnext_tpu.data.synthetic import SyntheticDriveDataset
from sfmnext_tpu.training.trainer import Trainer


class SynthLoader:
    def __init__(self, n_batches, batch_size, h, w, seed=0):
        self.ds = SyntheticDriveDataset(h, w, seed=seed)
        self.n = n_batches
        self.bs = batch_size

    def __len__(self):
        return self.n

    def __iter__(self):
        for _ in range(self.n):
            yield self.ds.batch(self.bs)


def tiny_opt(tmp_path, **kw):
    d = dict(
        backbone="resnet", num_layers=18, num_features=64, model_dim=16,
        patch_size=4, query_nums=16, dim_out=16, height=64, width=96,
        batch_size=4, num_epochs=1, log_frequency=1, save_frequency=1,
        log_dir=str(tmp_path), model_name="smoke", steps_per_epoch=2,
        num_workers=1, weights_init="scratch",
    )
    d.update(kw)
    return Options(**d)


def test_trainer_end_to_end(tmp_path):
    opt = tiny_opt(tmp_path, save_step_frequency=2)
    tr = Trainer(
        opt,
        train_loader=SynthLoader(2, 4, 64, 96),
        val_loader=SynthLoader(2, 4, 64, 96, seed=9),
    )
    tr.train()

    # checkpoints for epoch 0 written (initial + post-epoch overwrite)
    ckpts = glob.glob(os.path.join(str(tmp_path), "smoke", "models", "weights_*"))
    assert any(os.path.isdir(c) for c in ckpts)

    # step-periodic checkpoint (reference trainer_indoor.py:317-328)
    assert os.path.isdir(
        os.path.join(str(tmp_path), "smoke", "models", "weights_step_2")
    )

    # visual-debug panels (trainer.py:593-625): TB events or png fallback
    val_dir = os.path.join(str(tmp_path), "smoke", "val")
    has_tb = glob.glob(os.path.join(val_dir, "events.out.tfevents.*"))
    pngs = glob.glob(os.path.join(val_dir, "images", "*.png"))
    assert has_tb or pngs, "no image panels written"
    if pngs:
        names = " ".join(pngs)
        for key in ("color_0_0", "color_pred", "disp_0", "automask_0"):
            assert key in names, f"missing {key} panel in {names}"

    # metrics jsonl has train + val records with finite loss + depth metrics
    for mode in ("train", "val"):
        path = os.path.join(str(tmp_path), "smoke", mode, "metrics.jsonl")
        recs = [json.loads(l) for l in open(path)]
        assert recs, f"no {mode} metrics written"
        assert np.isfinite(recs[-1]["loss"])
        if mode == "val":
            assert "de/abs_rel" in recs[-1]

    # opt.json dumped (reference save_opts parity)
    assert os.path.exists(
        os.path.join(str(tmp_path), "smoke", "models", "opt.json")
    )

    # resume: load checkpoint back into a fresh trainer
    tr2 = Trainer(
        tiny_opt(tmp_path, model_name="smoke2"),
        train_loader=SynthLoader(2, 4, 64, 96),
        val_loader=None,
    )
    ckpt_dir = sorted(c for c in ckpts if os.path.isdir(c))[-1]
    tr2.load_model(ckpt_dir)
    import jax

    a = jax.tree_util.tree_leaves(tr.state.params)[0]
    b = jax.tree_util.tree_leaves(tr2.state.params)[0]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b))


class ListLoader:
    def __init__(self, batches):
        self.batches = batches

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


def _read_losses(tmp_path, name):
    path = os.path.join(str(tmp_path), name, "train", "metrics.jsonl")
    return {r["step"]: r["loss"] for r in map(json.loads, open(path))}


def test_interrupt_and_resume_matches_unbroken(tmp_path):
    """Full-fidelity resume: an interrupted+resumed run reproduces the
    unbroken run's loss trajectory step-for-step (params, BN stats, Adam
    moments, LR-schedule count and rng all restored — reference
    trainer.py:662-688 incl. the unconditional adam.pth load)."""
    ds = SyntheticDriveDataset(64, 96, seed=3)
    batches = [ds.batch(2) for _ in range(4)]

    # unbroken: 4 steps, checkpoint at step 2
    opt_a = tiny_opt(
        tmp_path, model_name="unbroken", steps_per_epoch=4, batch_size=2,
        save_step_frequency=2, log_frequency=1,
    )
    tr_a = Trainer(opt_a, train_loader=ListLoader(batches), val_loader=None)
    tr_a.train()

    # resumed: load the step-2 checkpoint, then run steps 2-3's batches
    ckpt_dir = os.path.join(
        str(tmp_path), "unbroken", "models", "weights_step_2"
    )
    assert os.path.isdir(ckpt_dir)
    opt_b = tiny_opt(
        tmp_path, model_name="resumed", steps_per_epoch=2, batch_size=2,
        load_weights_folder=ckpt_dir, log_frequency=1,
    )
    tr_b = Trainer(
        opt_b, train_loader=ListLoader(batches[2:]), val_loader=None
    )
    assert tr_b.step == 2  # step counter restored
    tr_b.train()

    losses_a = _read_losses(tmp_path, "unbroken")
    losses_b = _read_losses(tmp_path, "resumed")
    assert set(losses_b) == {2, 3}
    for s in (2, 3):
        np.testing.assert_allclose(
            losses_b[s], losses_a[s], rtol=1e-5,
            err_msg=f"loss diverged at resumed step {s}",
        )

    # and the final params match bitwise-ish
    for x, y in zip(
        jax.tree_util.tree_leaves(tr_a.state.params),
        jax.tree_util.tree_leaves(tr_b.state.params),
    ):
        np.testing.assert_allclose(
            np.asarray(x), np.asarray(y), rtol=1e-5, atol=1e-7
        )


def test_preempt_and_latest_resume(tmp_path):
    """Preemption cycle: SIGTERM mid-run writes a weights_interrupt
    checkpoint; relaunching the SAME command line with
    ``--load_weights_folder latest`` picks it up, fast-forwards the epoch
    schedule, and finishes the remaining steps (total step count equals an
    unbroken run's)."""
    import signal as _signal

    ds = SyntheticDriveDataset(64, 96, seed=5)
    batches = [ds.batch(2) for _ in range(2)]

    class SignalingLoader(ListLoader):
        """Raises SIGTERM in-process after serving the first batch."""

        def __iter__(self):
            for i, b in enumerate(self.batches):
                if i == 1:
                    os.kill(os.getpid(), _signal.SIGTERM)
                yield b

    kw = dict(
        model_name="preempt", steps_per_epoch=1, num_epochs=2, batch_size=2,
        load_weights_folder="latest", log_frequency=1,
    )
    tr_a = Trainer(
        tiny_opt(tmp_path, **kw),
        train_loader=SignalingLoader(batches), val_loader=None,
    )
    assert tr_a.step == 0  # "latest" with no checkpoint: fresh start
    tr_a.train()  # epoch 0 completes; SIGTERM lands during epoch 1
    assert tr_a._interrupted == _signal.SIGTERM
    interrupt_dir = os.path.join(
        str(tmp_path), "preempt", "models", "weights_interrupt"
    )
    assert os.path.isdir(interrupt_dir)

    # relaunch, identical options: resumes from weights_interrupt (the
    # newest checkpoint), fast-forwards to epoch 1, runs only step 1
    tr_b = Trainer(
        tiny_opt(tmp_path, **kw),
        train_loader=ListLoader(batches[1:]), val_loader=None,
    )
    assert tr_b.step == 1  # restored from the interrupt checkpoint
    tr_b.train()
    assert tr_b.step == 2  # exactly the remaining step ran
    losses = _read_losses(tmp_path, "preempt")
    assert set(losses) == {0, 1}


import jax  # noqa: E402  (used in resume tests)
