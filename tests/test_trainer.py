"""Tests: trainer loop e2e on synthetic data, schedulers, checkpoint resume."""

import dataclasses

import jax
import numpy as np

from multimodal_mtrssm_tpu.data import DataModuleConfig, EpisodeDataModule, generate_synthetic_audio_mnist
from multimodal_mtrssm_tpu.models import MoPoEMRSSM, MRSSMConfig
from multimodal_mtrssm_tpu.nn.conv import EncoderConfig
from multimodal_mtrssm_tpu.train import EarlyStopping, PlateauScheduler, Trainer, TrainerConfig

from conftest import small_encoder_config


def small_model():
    enc = small_encoder_config()
    return MoPoEMRSSM(MRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=32))


def test_plateau_scheduler():
    s = PlateauScheduler(base_lr=1.0, factor=0.5, patience=1)
    assert s.step(1.0) == 1.0  # new best
    assert s.step(2.0) == 1.0  # bad 1 (<= patience)
    assert s.step(2.0) == 0.5  # bad 2 → reduce
    assert s.step(0.5) == 0.5  # new best, no change
    # round-trip
    s2 = PlateauScheduler.from_state_dict(s.state_dict())
    assert s2.lr == 0.5 and s2.best == 0.5


def test_early_stopping():
    e = EarlyStopping(patience=2)
    assert not e.step(1.0)
    assert not e.step(1.5)
    assert e.step(1.5)  # second bad epoch: wait_count >= patience (Lightning)


def test_plateau_relative_threshold():
    """Negligible improvements must not reset patience (torch
    ReduceLROnPlateau default rel threshold 1e-4)."""
    s = PlateauScheduler(base_lr=1.0, factor=0.5, patience=1, threshold=1e-4)
    assert s.step(100.0) == 1.0  # best
    assert s.step(99.999) == 1.0  # <1e-4 relative improvement → bad 1
    assert s.step(99.999) == 0.5  # bad 2 → reduce
    s2 = PlateauScheduler(base_lr=1.0, factor=0.5, patience=1, threshold=1e-4)
    s2.step(100.0)
    assert s2.step(99.9) == 1.0  # real improvement resets
    assert s2.bad_epochs == 0


def test_fit_from_memmapped_pack(tmp_path):
    """Training end-to-end from a consolidated memmapped pack."""
    from multimodal_mtrssm_tpu.data.pack import pack_episodes

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=4, episode_length=6)
    pack_episodes(data_dir, data_dir / "pack")
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
    dm.setup()
    assert dm._raw  # pack detected
    cfg = TrainerConfig(max_epochs=1, log_dir=str(tmp_path / "run"), learning_rate=3e-4)
    out = Trainer(small_model(), dm, cfg).fit()
    assert np.isfinite(out["history"][0]["train/loss"])


def test_fit_deterministic_across_runs(tmp_path):
    """Same seed ⇒ identical losses (the reference's `deterministic: true` +
    seed_everything contract, configs :2,120)."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=4, episode_length=6)

    def run(log_dir):
        dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
        cfg = TrainerConfig(max_epochs=2, log_dir=str(tmp_path / log_dir), learning_rate=3e-4)
        return Trainer(small_model(), dm, cfg).fit()["history"]

    h1, h2 = run("r1"), run("r2")
    for a, b in zip(h1, h2):
        assert a["train/loss"] == b["train/loss"]
        assert a["val/loss"] == b["val/loss"]


def test_fit_two_epochs_and_resume(tmp_path):
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=6, episode_length=8)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=4))
    model = small_model()
    cfg = TrainerConfig(max_epochs=2, log_dir=str(tmp_path / "run"), learning_rate=3e-4)
    trainer = Trainer(model, dm, cfg)
    out = trainer.fit()
    assert len(out["history"]) == 2
    row = out["history"][-1]
    for k in ("train/loss", "train/recon", "train/kl", "val/loss", "seq_per_sec"):
        assert k in row, f"missing metric {k}"
    assert np.isfinite(row["train/loss"])
    # loss should improve from epoch 0 to 1 on this easy synthetic set
    assert out["history"][1]["train/loss"] < out["history"][0]["train/loss"]
    # checkpoints exist
    assert trainer.ckpt.exists("best")
    assert trainer.ckpt.exists("last")
    assert (tmp_path / "run" / "metrics.jsonl").exists()

    # resume continues past epoch 2
    cfg2 = TrainerConfig(max_epochs=3, log_dir=str(tmp_path / "run"), learning_rate=3e-4)
    trainer2 = Trainer(model, dm, cfg2)
    out2 = trainer2.fit(resume=True)
    assert len(out2["history"]) == 1  # only epoch 2 ran
    assert out2["history"][0]["epoch"] == 2


def test_viz_callback_covers_both_stages_and_mirrors_wandb(tmp_path, monkeypatch):
    """Reference viz parity: episodes from BOTH train and val loaders, <=7
    per stage (reference callback.py:156-210), and GIFs mirrored through the
    W&B logger when enabled (callback.py:426-502) — asserted via a stub."""
    import sys
    import types

    calls = []

    defined = []

    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: None
    stub.log = lambda payload, step=None: calls.append((payload, step))
    stub.Video = lambda path, fps=10, format="gif": ("video", str(path))
    stub.Image = lambda path: ("image", str(path))
    stub.finish = lambda: None
    stub.run = types.SimpleNamespace(
        define_metric=lambda name, **kw: defined.append((name, kw))
    )
    stub.plot = types.SimpleNamespace(
        line_series=lambda xs, ys, keys, title, xname: ("line_series", keys, title, xs, ys)
    )
    monkeypatch.setitem(sys.modules, "wandb", stub)

    from multimodal_mtrssm_tpu.viz.callback import LogRSSMOutput

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=12, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
    cfg = TrainerConfig(max_epochs=1, log_dir=str(tmp_path / "run"), learning_rate=3e-4,
                        use_wandb=True)
    viz = LogRSSMOutput(every_n_epochs=1, query_length=2, fps=5.0)
    trainer = Trainer(small_model(), dm, cfg, callbacks=[viz])
    trainer.fit()

    viz_root = tmp_path / "run" / "viz" / "final_best"
    train_gifs = sorted((viz_root / "train").glob("*.gif"))
    val_gifs = sorted((viz_root / "val").glob("*.gif"))
    assert 1 <= len(train_gifs) <= 7
    assert 1 <= len(val_gifs) <= 7
    # 12 episodes, 0.8 split → 9 train (capped at 7) and 3 val episodes
    assert len(train_gifs) == 7
    assert len(val_gifs) == 3
    video_calls = [c for c, _ in calls if any(isinstance(v, tuple) and v[0] == "video"
                                              for v in c.values())]
    assert len(video_calls) >= 10  # every rendered gif mirrored
    image_calls = [c for c, _ in calls if any(isinstance(v, tuple) and v[0] == "image"
                                              for v in c.values())]
    assert image_calls  # combined charts mirrored
    # Native wandb.plot.line_series parity (reference callback.py:66-123):
    # combined train-vs-val panels for loss/recon/kl, on the epoch axis,
    # and define_metric grouping declared at init.
    ls_calls = {k: v for c, _ in calls for k, v in c.items()
                if isinstance(v, tuple) and v[0] == "line_series"}
    assert {"loss_combined", "recon_combined", "kl_combined"} <= set(ls_calls)
    assert ls_calls["loss_combined"][1] == ["train", "val"]
    # Chart logs must carry an explicit step: an unstepped log advances
    # W&B's internal counter past the next epoch's step, silently dropping
    # every later stepped scalar.
    chart_steps = [s for c, s in calls
                   if any(isinstance(v, tuple) and v[0] == "line_series" for v in c.values())]
    assert chart_steps and all(s is not None for s in chart_steps)
    assert ("train/loss", {"step_metric": "epoch", "summary": "min"}) in defined
    assert ("val/kl", {"step_metric": "epoch", "summary": "min"}) in defined


def test_fit_zero1_hybrid_mesh_matches_replicated(tmp_path):
    """TrainerConfig(zero1=True, dcn_size=2): moments sharded over the
    within-slice axis, training numerics equal to the replicated run
    (batch 8 divides the 8-device mesh, so both runs use every device)."""
    data_dir = tmp_path / "data"
    # 40 episodes → 32 train / 8 val: both batch sizes divide the 8-device
    # mesh, so the divisibility loop keeps every device.
    generate_synthetic_audio_mnist(data_dir, n_episodes=40, episode_length=6)

    def run(log_dir, **kw):
        dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=8, sequence_length=3))
        cfg = TrainerConfig(max_epochs=2, log_dir=str(tmp_path / log_dir), learning_rate=3e-4, **kw)
        tr = Trainer(small_model(), dm, cfg)
        return tr, tr.fit()

    tr_z, out_z = run("zero1", zero1=True, dcn_size=2)
    assert tr_z.mesh.axis_names == ("dcn", "data")
    assert str(out_z["opt_state"].m.sharding.spec) == "PartitionSpec('data',)"
    assert np.isfinite(out_z["history"][-1]["train/loss"])

    _, out_r = run("repl")
    # A stray SIGTERM (e.g. from the CI harness) gracefully preempts a fit
    # mid-run; that must surface as THIS clear message, not as a numerics
    # mismatch between a 1-epoch and a 2-epoch run (seen 2026-08-19).
    assert not out_z["preempted"] and not out_r["preempted"], \
        "a run was preempted by SIGTERM mid-test; rerun"
    assert len(out_z["history"]) == len(out_r["history"]) == 2
    # f32 moment math reassociates across shards; losses agree tightly.
    np.testing.assert_allclose(
        out_z["history"][-1]["train/loss"], out_r["history"][-1]["train/loss"], rtol=1e-4
    )


def test_accumulate_grad_batches(tmp_path):
    """Lightning Trainer.accumulate_grad_batches semantics: one optimizer
    step per window (+ the leftover window), gradients averaged over it."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=7, episode_length=6)
    # 5 train episodes / batch 1 → 5 batches; accum=2 → steps at batch
    # 2 and 4, plus the leftover single-batch window = 3 steps/epoch.
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=1, sequence_length=3))
    cfg = TrainerConfig(max_epochs=1, log_dir=str(tmp_path / "run"),
                        learning_rate=3e-4, accumulate_grad_batches=2)
    out = Trainer(small_model(), dm, cfg).fit()
    assert np.isfinite(out["history"][0]["train/loss"])
    assert int(out["opt_state"].count) == 3  # optimizer steps, not batches

    # deterministic across runs with accumulation on
    cfg2 = TrainerConfig(max_epochs=1, log_dir=str(tmp_path / "run2"),
                         learning_rate=3e-4, accumulate_grad_batches=2)
    out2 = Trainer(small_model(), dm, cfg2).fit()
    assert out["history"][0]["train/loss"] == out2["history"][0]["train/loss"]


def test_preemption_sigterm_saves_exact_resume(tmp_path):
    """SIGTERM mid-run (spot/preemptible TPU) → the fit loop finishes the
    in-flight step, saves an exact-resume 'last' checkpoint, and returns;
    resume=True re-runs the interrupted epoch and completes the run."""
    import os
    import signal

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=4, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))

    class PreemptAfterEpoch1:
        def __call__(self, trainer, epoch, params, row):
            if epoch == 1:
                os.kill(os.getpid(), signal.SIGTERM)

    cfg = TrainerConfig(max_epochs=50, log_dir=str(tmp_path / "run"), learning_rate=3e-4,
                        checkpoint_every_n_epochs=1000)  # periodic saves off
    model = small_model()
    trainer = Trainer(model, dm, cfg, callbacks=[PreemptAfterEpoch1()])
    out = trainer.fit()
    # Signal lands during epoch 2's batch loop → epochs 0..1 complete.
    assert out["preempted"]
    assert len(out["history"]) == 2
    assert trainer.ckpt.exists("last")
    # default SIGTERM disposition restored after fit
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL

    cfg2 = TrainerConfig(max_epochs=4, log_dir=str(tmp_path / "run"), learning_rate=3e-4)
    out2 = Trainer(model, dm, cfg2).fit(resume=True)
    assert [r["epoch"] for r in out2["history"]] == [2, 3]


def test_schedulers_match_torch():
    """Cosine/Step/Exponential schedules must track torch.optim.lr_scheduler
    epoch-for-epoch (torch is in-image: use it as ground truth)."""
    import torch

    from multimodal_mtrssm_tpu.train.optim import (
        CosineAnnealingScheduler,
        ExponentialScheduler,
        StepScheduler,
        scheduler_from_state_dict,
    )

    def torch_lrs(make, epochs=12):
        p = [torch.nn.Parameter(torch.zeros(1))]
        opt = torch.optim.SGD(p, lr=0.1)
        sch = make(opt)
        lrs = []
        for _ in range(epochs):
            lrs.append(opt.param_groups[0]["lr"])
            opt.step()
            sch.step()
        return lrs

    def ours_lrs(sch, epochs=12):
        lrs = []
        for _ in range(epochs):
            lrs.append(sch.lr)
            sch.step(0.0)
        return lrs

    got = ours_lrs(CosineAnnealingScheduler(0.1, t_max=10, eta_min=0.01))
    want = torch_lrs(lambda o: torch.optim.lr_scheduler.CosineAnnealingLR(o, T_max=10, eta_min=0.01))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    got = ours_lrs(StepScheduler(0.1, step_size=4, gamma=0.5))
    want = torch_lrs(lambda o: torch.optim.lr_scheduler.StepLR(o, step_size=4, gamma=0.5))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    got = ours_lrs(ExponentialScheduler(0.1, gamma=0.9))
    want = torch_lrs(lambda o: torch.optim.lr_scheduler.ExponentialLR(o, gamma=0.9))
    np.testing.assert_allclose(got, want, rtol=1e-6)

    # resume round-trip keeps kind and position
    s = CosineAnnealingScheduler(0.1, t_max=10)
    s.step(0.0); s.step(0.0)
    s2 = scheduler_from_state_dict(s.state_dict())
    assert type(s2) is CosineAnnealingScheduler and s2.epoch == 2 and s2.lr == s.lr


def test_cosine_scheduler_from_yaml(tmp_path):
    """A CosineAnnealingLR lr_scheduler node drives the fit loop's LR."""
    import yaml

    from multimodal_mtrssm_tpu.train.config import load_experiment

    base = yaml.safe_load(open("configs/mopoe_mrssm.yaml"))
    base["lr_scheduler"] = {
        "class_path": "torch.optim.lr_scheduler.CosineAnnealingLR",
        "init_args": {"T_max": 4, "eta_min": 0.0},
    }
    cfg_path = tmp_path / "cosine.yaml"
    cfg_path.write_text(yaml.safe_dump(base))
    exp = load_experiment(cfg_path)
    assert exp.trainer.lr_scheduler == {"kind": "cosine", "t_max": 4, "eta_min": 0.0}

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=4, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
    cfg = TrainerConfig(max_epochs=3, log_dir=str(tmp_path / "run"), learning_rate=1e-3,
                        lr_scheduler=exp.trainer.lr_scheduler)
    out = Trainer(small_model(), dm, cfg).fit()
    lrs = [r["lr"] for r in out["history"]]
    import math
    want = [1e-3 * (1 + math.cos(math.pi * t / 4)) / 2 for t in range(3)]
    np.testing.assert_allclose(lrs, want, rtol=1e-6)


def test_divergence_guard_halts_and_saves(tmp_path):
    """Failure detection (SURVEY §5.3): a diverging run (absurd LR → non-
    finite metrics) halts with a 'diverged' diagnostic checkpoint instead of
    silently training on NaNs for the remaining epochs."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=4, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
    cfg = TrainerConfig(max_epochs=5, log_dir=str(tmp_path / "run"), learning_rate=1e18)
    trainer = Trainer(small_model(), dm, cfg)
    out = trainer.fit()
    assert len(out["history"]) < 5, "guard did not halt a diverged run"
    assert trainer.ckpt.exists("diverged")
    _, aux = trainer.ckpt.restore(
        "diverged", {"params": out["params"], "opt_state": out["opt_state"]}
    )
    assert aux["non_finite"], "diagnostic checkpoint missing the offending metric names"
    # The diagnostic checkpoint carries the SAME aux shape as 'last'
    # (global_step + key_base) so fit(resume_from=…/diverged) resumes
    # exactly instead of silently resetting the step counter.
    assert aux["global_step"] > 0 and "key_base" in aux and "scheduler" in aux
    cfg2 = TrainerConfig(max_epochs=aux["epoch"] + 2, log_dir=str(tmp_path / "run2"))
    out2 = Trainer(small_model(), dm, cfg2).fit(
        resume_from=tmp_path / "run" / "checkpoints" / "diverged"
    )
    assert out2["history"][0]["epoch"] == aux["epoch"] + 1  # full-state resume


def test_resume_from_incompatible_full_state_warm_starts(tmp_path):
    """A full-state checkpoint whose opt_state doesn't match this run's
    optimizer (different build / mesh) falls back to a params-only warm
    start instead of crashing on the Orbax structure mismatch."""
    from multimodal_mtrssm_tpu.train.checkpoint import CheckpointManager

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=4, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
    params = small_model().init(jax.random.PRNGKey(0))
    ck = tmp_path / "foreign"
    CheckpointManager(ck).save(
        "last",
        {"params": params, "opt_state": {"alien": np.zeros(3, np.float32)}},
        {"epoch": 3, "scheduler": {"kind": "plateau"}},  # claims full state
    )
    cfg = TrainerConfig(max_epochs=1, log_dir=str(tmp_path / "run"))
    out = Trainer(small_model(), dm, cfg).fit(resume_from=ck)
    assert out["history"][0]["epoch"] == 0  # warm start, not epoch-4 resume


def test_steps_per_dispatch_matches_per_step_loop(tmp_path):
    """Multi-step-scan training (K optimizer steps per dispatch) must train
    the SAME steps as the per-step loop: same batch order, same RNG folds —
    epoch metrics agree to f32 tolerance."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=22, episode_length=6)

    def run(log_dir, k):
        dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
        cfg = TrainerConfig(max_epochs=2, log_dir=str(tmp_path / log_dir),
                            learning_rate=3e-4, steps_per_dispatch=k)
        return Trainer(small_model(), dm, cfg).fit()["history"]
    # 17 train episodes / batch 2 → 8 full batches + ragged tail; 5 val
    # episodes → 2 full batches + tail: K=2 exercises train AND val scan
    # chunks, leftover full batches, and both ragged tails.
    h1, h2 = run("r1", 1), run("r2", 2)
    for a, b in zip(h1, h2):
        for key in ("train/loss", "train/kl", "val/loss"):
            np.testing.assert_allclose(a[key], b[key], rtol=1e-4, err_msg=key)


def test_train_batches_chunked_identical_content(tmp_path):
    """The chunked stream must reproduce train_batches exactly (same
    permutation and noise draws), grouped as [K,B,...] stacks + leftovers."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=9, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
    dm.setup()
    flat = [tuple(np.asarray(x) for x in b) for b in dm.train_batches(3)]
    chunked = list(dm.train_batches_chunked(3, 2))
    rebuilt = []
    for kind, payload in chunked:
        if kind == "scan":
            k = payload[0].shape[0]
            for i in range(k):
                rebuilt.append(tuple(np.asarray(x[i]) for x in payload))
        else:
            rebuilt.append(tuple(np.asarray(x) for x in payload))
    assert len(rebuilt) == len(flat)
    for a, b in zip(flat, rebuilt):
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


def test_mmtrssm_fit_scan_mode(tmp_path):
    """The multi-step-scan path is model-agnostic: MoPoE-MMTRSSM (MTState
    carry, dual KL) trains through scan chunks with finite improving loss."""
    from multimodal_mtrssm_tpu.models import MMTRSSMConfig, MoPoEMMTRSSM
    from multimodal_mtrssm_tpu.nn.conv import EncoderConfig

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=11, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
    enc = EncoderConfig(channels=(4, 8), kernel_sizes=(3, 3), strides=(2, 2), paddings=(1, 1),
                        num_residual_blocks=0, coord_conv=False, linear_sizes=(64,))
    model = MoPoEMMTRSSM(MMTRSSMConfig(audio_encoder=enc, vision_encoder=enc, init_proj_cells=32))
    cfg = TrainerConfig(max_epochs=2, log_dir=str(tmp_path / "run"),
                        learning_rate=3e-4, steps_per_dispatch=2)
    out = Trainer(model, dm, cfg).fit()  # 8 train eps -> 4 full batches -> 2 scan chunks
    assert np.isfinite(out["history"][-1]["train/loss"])
    assert "train/kl_h" in out["history"][-1]
    assert out["history"][1]["train/loss"] < out["history"][0]["train/loss"]


def test_auto_steps_per_dispatch_resolution(tmp_path):
    """auto K: bounded by chunk memory, the K=256 cap (BASELINE.md K-sweep
    knee), and the number of full train batches per epoch (so small
    datasets still form chunks)."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=11, episode_length=6)
    dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
    tr = Trainer(small_model(), dm, TrainerConfig(log_dir=str(tmp_path / "r")))
    # 8 train episodes / batch 2 -> 4 full batches; tiny batches -> memory no bound
    assert tr._resolve_spd() == 4
    tr.cfg = dataclasses.replace(tr.cfg, steps_per_dispatch=7)
    assert tr._resolve_spd() == 7

    # The other two bounds, via a stub datamodule (the real one would need
    # thousands of episodes): the K=256 cap and the 1 GB chunk budget.
    class _StubDM:
        train_batch_size = 8

        def __init__(self, n_train, nbytes):
            self.n_train = n_train
            self._nbytes = nbytes

        def batch_nbytes(self, bs):
            return self._nbytes

    tr.cfg = dataclasses.replace(tr.cfg, steps_per_dispatch="auto")
    tr.dm = _StubDM(n_train=8 * 10_000, nbytes=4 << 20)  # plenty of batches
    assert tr._resolve_spd() == 256  # capped at 256 (BASELINE.md K-sweep knee)
    tr.dm = _StubDM(n_train=8 * 10_000, nbytes=64 << 20)  # 64 MB batches
    assert tr._resolve_spd() == 16  # 1 GB budget / 64 MB = 16 < 256


def test_mid_epoch_preemption_resume_bit_exact(tmp_path):
    """SIGTERM mid-epoch → resume continues from the next batch with the
    reconstructed key schedule: final params are BIT-IDENTICAL to an
    uninterrupted run (no batch trained twice, none skipped)."""
    import os
    import signal

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=13, episode_length=6)

    def make(log_dir):
        dm = EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))
        cfg = TrainerConfig(max_epochs=1, log_dir=str(tmp_path / log_dir), learning_rate=3e-4,
                            steps_per_dispatch=1, checkpoint_every_n_epochs=1)
        return Trainer(small_model(), dm, cfg)

    # Reference: uninterrupted single epoch (10 train episodes -> 5 batches).
    tr_ref = make("ref")
    out_ref = tr_ref.fit()

    # Interrupted: SIGTERM after the 2nd train step of epoch 0.
    tr_int = make("int")
    real_step = tr_int._train_step
    calls = {"n": 0}

    def stepper(*a):
        calls["n"] += 1
        if calls["n"] == 2:
            os.kill(os.getpid(), signal.SIGTERM)
        return real_step(*a)

    tr_int._train_step = stepper
    out_int = tr_int.fit()
    assert out_int["history"] == []  # epoch 0 was interrupted before completing
    _, aux = tr_int.ckpt.restore("last", {"params": out_int["params"],
                                          "opt_state": out_int["opt_state"]})
    assert aux["mid_epoch"] and aux["items_done"] == 2

    # Resume in a fresh trainer (no monkeypatch) and compare final params.
    tr_res = make("int")
    out_res = tr_res.fit(resume=True)
    assert [r["epoch"] for r in out_res["history"]] == [0]
    for a, b in zip(jax.tree.leaves(out_ref["params"]), jax.tree.leaves(out_res["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # the resumed epoch row equals the uninterrupted epoch row (sample-
    # weighted metrics restored across the preemption boundary)
    np.testing.assert_allclose(out_res["history"][0]["train/loss"],
                               out_ref["history"][0]["train/loss"], rtol=1e-6)


def test_fit_resume_from_warm_start(tmp_path):
    """fit(resume_from=…) mirrors Lightning fit(ckpt_path=…): run B can
    warm-start from run A's best (params-only) checkpoint, and a full
    'last' checkpoint from another run resumes exactly (VERDICT r2 item 9)."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=4, episode_length=6)

    def dm():
        return EpisodeDataModule(DataModuleConfig(data_dir=data_dir, batch_size=2, sequence_length=3))

    cfg_a = TrainerConfig(max_epochs=2, log_dir=str(tmp_path / "runA"), learning_rate=3e-4)
    Trainer(small_model(), dm(), cfg_a).fit()
    ckpts_a = tmp_path / "runA" / "checkpoints"

    # Warm start from run A's best (params-only): epochs restart at 0 and the
    # first epoch starts from A's trained weights, not a fresh init.
    cfg_b = TrainerConfig(max_epochs=1, log_dir=str(tmp_path / "runB"), learning_rate=3e-4)
    out_b = Trainer(small_model(), dm(), cfg_b).fit(resume_from=ckpts_a / "best")
    assert out_b["history"][0]["epoch"] == 0
    # A fresh-init run's first train loss for comparison:
    cfg_c = TrainerConfig(max_epochs=1, log_dir=str(tmp_path / "runC"), learning_rate=3e-4)
    out_c = Trainer(small_model(), dm(), cfg_c).fit()
    assert out_b["history"][0]["train/loss"] < out_c["history"][0]["train/loss"]

    # Full-state resume from another run's checkpoints dir: continues epochs.
    cfg_d = TrainerConfig(max_epochs=4, log_dir=str(tmp_path / "runD"), learning_rate=3e-4)
    out_d = Trainer(small_model(), dm(), cfg_d).fit(resume_from=ckpts_a)
    assert out_d["history"][0]["epoch"] == 2  # run A finished epoch 1

    # Missing path is loud.
    import pytest

    with pytest.raises(FileNotFoundError):
        Trainer(small_model(), dm(), TrainerConfig(max_epochs=1, log_dir=str(tmp_path / "runE"))).fit(
            resume_from=tmp_path / "nope"
        )


def test_device_resident_fit_matches_host_stream(tmp_path):
    """Training from the device-resident dataset (on-device gather chunks)
    is bit-identical to the host-streamed fit when host noise is off (same
    permutation, same values, same per-step RNG)."""
    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=11, episode_length=6)

    def run(dev: bool):
        dm = EpisodeDataModule(DataModuleConfig(
            data_dir=data_dir, batch_size=2, sequence_length=3, noise_std=0.0,
            device_resident=dev))
        cfg = TrainerConfig(max_epochs=2, log_dir=str(tmp_path / f"r{dev}"),
                            learning_rate=3e-4, steps_per_dispatch=2)
        return Trainer(small_model(), dm, cfg).fit()["history"]

    host, dev = run(False), run(True)
    assert len(host) == len(dev) == 2
    for h, d in zip(host, dev):
        for key in ("train/loss", "val/loss"):
            assert h[key] == d[key], (key, h[key], d[key])


def test_mid_epoch_preemption_resume_device_resident(tmp_path):
    """Mid-epoch preemption + resume under device-resident chunks WITH
    on-device noise: the noise-key schedule advances with the item counter
    across the resume skip, so final params are bit-identical to an
    uninterrupted run."""
    import os
    import signal

    data_dir = tmp_path / "data"
    generate_synthetic_audio_mnist(data_dir, n_episodes=13, episode_length=6)

    def make(log_dir):
        dm = EpisodeDataModule(DataModuleConfig(
            data_dir=data_dir, batch_size=2, sequence_length=3, noise_std=0.1,
            device_resident=True))
        cfg = TrainerConfig(max_epochs=1, log_dir=str(tmp_path / log_dir),
                            learning_rate=3e-4, steps_per_dispatch=2,
                            checkpoint_every_n_epochs=1)
        return Trainer(small_model(), dm, cfg)

    out_ref = make("ref").fit()

    # Interrupt after the first scan chunk (10 train eps -> scan, scan, step).
    tr_int = make("int")
    real_scan = tr_int._train_scan

    def scanner(*a):
        os.kill(os.getpid(), signal.SIGTERM)
        return real_scan(*a)

    tr_int._train_scan = scanner
    out_int = tr_int.fit()
    assert out_int["history"] == []
    _, aux = tr_int.ckpt.restore("last", {"params": out_int["params"],
                                          "opt_state": out_int["opt_state"]})
    assert aux["mid_epoch"] and aux["items_done"] == 1

    tr_res = make("int")
    out_res = tr_res.fit(resume=True)
    assert [r["epoch"] for r in out_res["history"]] == [0]
    for a, b in zip(jax.tree.leaves(out_ref["params"]), jax.tree.leaves(out_res["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_allclose(out_res["history"][0]["train/loss"],
                               out_ref["history"][0]["train/loss"], rtol=1e-6)


def test_device_resident_fit_matches_host_on_mesh(tmp_path):
    """On a multi-device mesh the device-resident dataset replicates and
    chunks come out batch-sharded: the fit is bit-identical to the
    host-streamed sharded fit (noise off)."""
    data_dir = tmp_path / "data"
    # 40 episodes → train 32 / val 8: both batch sizes divide the 8-device
    # mesh, so the trainer keeps every virtual device.
    generate_synthetic_audio_mnist(data_dir, n_episodes=40, episode_length=6)

    def run(dev: bool):
        dm = EpisodeDataModule(DataModuleConfig(
            data_dir=data_dir, batch_size=8, sequence_length=3, noise_std=0.0,
            device_resident=dev))
        cfg = TrainerConfig(max_epochs=2, log_dir=str(tmp_path / f"m{dev}"),
                            learning_rate=3e-4, steps_per_dispatch=2)
        tr = Trainer(small_model(), dm, cfg)
        assert tr.mesh.devices.size > 1  # conftest provides 8 virtual devices
        hist = tr.fit()["history"]
        if dev:
            # The SHARDED gather branch must have compiled (B=8 divides the
            # mesh): at least one assembler was jitted with out_shardings.
            assert any(sh is not None for sh in dm._gather_fns)
            assert dm._dev_data_key is not None  # replicated placement cached
        return hist

    host, dev = run(False), run(True)
    for h, d in zip(host, dev):
        for key in ("train/loss", "val/loss"):
            assert h[key] == d[key], (key, h[key], d[key])


def test_bench_e2e_train_contract(tmp_path, capsys, monkeypatch):
    """benchmarks/bench_e2e_train.py stays runnable and emits one parseable
    JSON line with the contract keys (the TPU e2e evidence in BASELINE.md
    is produced by this script)."""
    import json
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent.parent / "benchmarks"))
    import bench_e2e_train

    monkeypatch.setattr(sys, "argv", [
        "bench_e2e_train", "--episodes", "12", "--epochs", "2",
        "--batch-size", "2", "--seq-len", "3", "--conv-dtype", "float32",
        "--device-resident", "--workdir", str(tmp_path)])
    bench_e2e_train.main()
    out = capsys.readouterr().out.strip().splitlines()
    row = json.loads(out[-1])
    assert row["metric"] == "e2e_train_seq_per_s"
    assert row["device_resident"] is True and row["model"] == "mrssm"
    assert row["value"] > 0 and len(row["epoch_rates"]) == 2
    # the dataset marker guards against stale-workdir reuse
    assert json.loads((tmp_path / "dataset.json").read_text()) == {
        "episodes": 12, "seq_len": 3}
