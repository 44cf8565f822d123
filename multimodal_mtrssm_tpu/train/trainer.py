"""Training harness: jitted DP train/val steps, epoch loop, callbacks.

Replaces the reference's LightningCLI fit loop (reference
``scripts/_train_common.py:9-33`` + trainer config
``configs/default.yaml:116-155``): seeding, AMP (bf16 on TPU instead of
16-mixed CUDA AMP), grad clipping, ReduceLROnPlateau, EarlyStopping,
best-checkpoint selection on ``val/loss``, per-epoch metric aggregation with
``train/``/``val/`` prefixes.

TPU-first structure:
- ONE jitted train step: loss + grad + optimizer update, params/opt donated
  (no reallocation per step), batch sharded over the ``data`` mesh axis,
  params replicated. Metric reduction across chips falls out of the global
  batch-mean (XLA inserts the psum) — the equivalent of Lightning's
  ``sync_dist=True`` (reference ``core.py:243,265``).
- LR changes are injected into optimizer state between epochs; no
  recompilation.
- ``jax.profiler`` trace hook for the SURVEY §5.1 observability gap.
"""

from __future__ import annotations

import dataclasses
import math
import time
import warnings
from pathlib import Path
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_mtrssm_tpu.data.pipeline import EpisodeDataModule
from multimodal_mtrssm_tpu.parallel.mesh import (
    batch_sharding,
    ici_size,
    make_hybrid_mesh,
    replicate,
    stacked_batch_sharding,
)
from multimodal_mtrssm_tpu.train.checkpoint import CheckpointManager
from multimodal_mtrssm_tpu.train.metrics import MetricLogger
from multimodal_mtrssm_tpu.train.optim import (
    EarlyStopping,
    make_optimizer,
    make_scheduler,
    scheduler_from_state_dict,
    set_learning_rate,
)


class _PreemptionGuard:
    """SIGTERM → finish the in-flight step, checkpoint, exit cleanly.

    Preemptible/spot TPU VMs deliver SIGTERM with a grace window; the
    reference (Lightning defaults) would die mid-epoch and lose everything
    since its last best-checkpoint. Here the fit loop polls ``flagged``
    after every batch and saves an exact-resume ``last`` checkpoint before
    returning. The previous handler is restored on exit; non-main-thread
    use (where signals can't be installed) degrades to a no-op guard.
    """

    def __init__(self):
        self.flagged = False
        self._prev = None
        # Separate installed flag: self._prev is None BOTH when install
        # failed and when the previous disposition was a non-Python handler
        # (signal.signal returns None for those) — restoring must happen in
        # the latter case or our no-op handler leaks past fit().
        self._installed = False

    def __enter__(self):
        import signal

        def _handler(signum, frame):
            self.flagged = True

        try:
            self._prev = signal.signal(signal.SIGTERM, _handler)
            self._installed = True
        except ValueError:  # not the main thread
            self._installed = False
        return self

    def __exit__(self, *exc):
        if self._installed:
            import signal

            signal.signal(signal.SIGTERM, self._prev if self._prev is not None else signal.SIG_DFL)
        return False


# Auto steps-per-dispatch sizing (BASELINE.md K-sweep: knee at K=256, device
# floor ~0.97 ms/step). Shared with benchmarks that reproduce the shipped
# default (benchmarks/bench_train_kernel.py --default-only).
SPD_CHUNK_BUDGET_BYTES = 1 << 30
SPD_MAX_STEPS = 256


@dataclasses.dataclass
class TrainerConfig:
    """Trainer hyperparameters (reference trainer:/optimizer: YAML blocks)."""

    max_epochs: int = 100
    seed: int = 42
    learning_rate: float = 1e-3
    grad_clip: float = 10.0
    weight_decay: float = 0.01
    adam_b1: float = 0.9
    adam_b2: float = 0.999
    adam_eps: float = 1e-8
    plateau_factor: float = 0.5
    plateau_patience: int = 50
    plateau_min_lr: float = 0.0
    plateau_threshold: float = 1e-4  # torch rel-threshold default
    early_stop_patience: int = 200
    early_stop_min_delta: float = 0.0
    log_dir: str = "runs/default"
    use_wandb: bool = False
    wandb_project: str | None = None
    profile_epoch: int | None = None  # jax.profiler trace of this epoch
    checkpoint_every_n_epochs: int = 10
    # LR scheduler spec: None → the reference's ReduceLROnPlateau with
    # plateau_factor/plateau_patience below; or {"kind": "cosine"|"step"|
    # "exponential"|"plateau", **kwargs} mirroring the torch schedulers the
    # YAML lr_scheduler.class_path can name.
    lr_scheduler: dict | None = None
    # Lightning Trainer.accumulate_grad_batches: optimizer steps every N
    # batches on the mean of the window's gradients (clip applies to the
    # accumulated gradient, matching Lightning). 1 = the fused
    # grad+update step (the fast path).
    accumulate_grad_batches: int = 1
    # ZeRO-1: shard the flat optimizer moment vectors over the within-slice
    # (ICI) mesh axis instead of replicating them. Pointless at the
    # reference's ~100k params; real memory relief for config-scaled models
    # (bench_large.py's 27M-param config: 2/n of a param-sized buffer pair
    # per chip).
    zero1: bool = False
    # Multi-slice pods: outer DCN mesh dimension. None auto-detects TPU
    # slices (1-D data mesh when single-slice); an explicit value forces a
    # (dcn, data) hybrid mesh — gradients psum across DCN, ZeRO-1 state and
    # its all-gather stay on ICI.
    dcn_size: int | None = None
    # Multi-step scan: train K optimizer steps per host dispatch by
    # lax.scan-ning the train step over a [K, B, ...] stack of batches.
    # Numerically IDENTICAL to the per-step loop (same batch order, same
    # per-step RNG fold), but removes K-1 of every K host→device dispatches;
    # measured 2.2× train throughput at K=32 and a further 1.8× by K=256
    # at the reference config B=8 T=30 on one v5e (see BASELINE.md
    # K-sweep). Leftover/ragged batches run per-step.
    # Only active when accumulate_grad_batches == 1. "auto" sizes K from
    # the batch bytes (≤1 GB per chunk, K ≤ 256, K ≤ full batches per
    # epoch) — see Trainer._resolve_spd.
    steps_per_dispatch: int | str = "auto"
    # Failure detection (SURVEY §5.3 — the reference has none at runtime):
    # when an epoch's aggregated metrics go non-finite, save a "diverged"
    # diagnostic checkpoint and halt instead of silently training on NaNs
    # (NaN poisons every subsequent step; EarlyStopping would never fire
    # because NaN < best is always False).
    halt_on_non_finite: bool = True


class Trainer:
    """Epoch-driven trainer for MoPoE-MRSSM / MoPoE-MMTRSSM models.

    ``model`` must expose ``init(key)`` and
    ``shared_step(params, batch, key) -> dict`` with a ``"loss"`` entry
    (both models in ``multimodal_mtrssm_tpu.models`` do).
    """

    def __init__(self, model, datamodule: EpisodeDataModule, config: TrainerConfig | None = None,
                 callbacks: list | None = None):
        self.model = model
        self.dm = datamodule
        self.cfg = config or TrainerConfig()
        self.callbacks = callbacks or []
        from multimodal_mtrssm_tpu.utils import enable_compilation_cache

        enable_compilation_cache()
        # Use the largest device prefix whose count divides both effective
        # batch sizes (sharded dim 0 must split evenly across the mesh).
        devices = jax.devices()
        self.dm._require_setup()
        tb, vb = self.dm.train_batch_size, self.dm.val_batch_size
        dcn = self.cfg.dcn_size
        n = len(devices)
        # An explicit hybrid mesh additionally needs n divisible by dcn_size.
        while tb % n != 0 or (vb and vb % n != 0) or (dcn and n >= dcn and n % dcn != 0):
            n -= 1
        if dcn and n < dcn:
            warnings.warn(
                f"batch sizes (train={tb}, val={vb}) admit no device count "
                f"divisible by dcn_size={dcn}; falling back to a flat data mesh.",
                stacklevel=2,
            )
            dcn = None
            n = len(devices)
            while tb % n != 0 or (vb and vb % n != 0):
                n -= 1
        if n < len(devices):
            warnings.warn(
                f"batch sizes (train={tb}, val={vb}) are not divisible by the "
                f"{len(devices)}-device mesh; training on {n} device(s). Pick a "
                f"batch size divisible by the device count to use every chip.",
                stacklevel=2,
            )
        try:
            self.mesh = make_hybrid_mesh(devices[:n], dcn_size=dcn)
        except ValueError:
            # Auto-detect mode on a multi-slice pod: the batch-divisibility
            # trim above can split a slice unevenly, which make_hybrid_mesh
            # rejects. Fall back to a flat data mesh (gradients then psum
            # over DCN without the ICI/DCN split) rather than failing. An
            # EXPLICITLY requested dcn_size, however, is a topology contract:
            # surface the error instead of silently training on a flat mesh.
            if dcn is not None:
                raise
            from multimodal_mtrssm_tpu.parallel.mesh import make_mesh

            warnings.warn(
                f"device trim ({n}/{len(devices)}) is incompatible with the "
                "detected slice layout; using a flat data mesh instead of a "
                "hybrid (dcn, data) mesh.",
                stacklevel=2,
            )
            self.mesh = make_mesh(devices[:n])
        print(
            f"trainer mesh: {n}/{len(devices)} device(s), "
            + " × ".join(f"{self.mesh.shape[a]} {a}" for a in self.mesh.axis_names)
        )
        # Thread the resolved mesh size into the model's train-kernel
        # dispatch (ops.pallas.resolve_train_kernel_mode): a multi-device
        # backend trimmed to a 1-device mesh still gets the fused-kernel
        # fast path, instead of the dispatch consulting the global backend
        # device count.
        self.model.mesh_devices = n
        if (self.cfg.accumulate_grad_batches > 1
                and getattr(self.dm.cfg, "device_resident", False)):
            warnings.warn(
                "accumulate_grad_batches > 1 trains on the per-step path, "
                "which streams batches from host — data.device_resident has "
                "no effect there (validation still uses it).",
                stacklevel=2,
            )
        if self.cfg.zero1:
            from jax.sharding import NamedSharding, PartitionSpec

            zero1_kw = dict(
                shard_pad=ici_size(self.mesh),
                moment_sharding=NamedSharding(self.mesh, PartitionSpec("data")),
            )
        else:
            zero1_kw = {}
        self.optimizer = make_optimizer(
            self.cfg.learning_rate, self.cfg.grad_clip, self.cfg.weight_decay,
            b1=self.cfg.adam_b1, b2=self.cfg.adam_b2, eps=self.cfg.adam_eps, **zero1_kw
        )
        self.ckpt = CheckpointManager(Path(self.cfg.log_dir) / "checkpoints")
        self.logger = MetricLogger(self.cfg.log_dir, self.cfg.use_wandb, self.cfg.wandb_project)
        self._build_steps()

    # ---- jitted steps ------------------------------------------------------
    def _build_steps(self) -> None:
        from multimodal_mtrssm_tpu.train.steps import make_train_scan, make_train_step

        model = self.model
        optimizer = self.optimizer

        # Step math lives in train/steps.py — ONE implementation shared with
        # bench.py and the multi-chip dry run, pinned by the
        # steps_per_dispatch equivalence test below.
        train_step = make_train_step(model, optimizer)
        train_scan = make_train_scan(model, optimizer)

        def val_step(params, batch, key, step):
            return model.shared_step(params, batch, jax.random.fold_in(key, step))

        def val_scan(params, stacked, key, step0):
            """K validation steps in one dispatch (metrics summed on device)."""
            k = stacked[0].shape[0]

            def body(carry, xs):
                batch, step = xs
                return carry, model.shared_step(params, batch, jax.random.fold_in(key, step))

            _, metrics = jax.lax.scan(body, None, (stacked, step0 + jnp.arange(k)))
            return jax.tree.map(jnp.sum, metrics)

        def grad_step(params, acc, batch, key, step):
            key = jax.random.fold_in(key, step)

            def loss_fn(p):
                d = model.shared_step(p, batch, key)
                return d["loss"], d

            grads, metrics = jax.grad(loss_fn, has_aux=True)(params)
            acc = jax.tree.map(lambda a, g: a + g, acc, grads)
            return acc, metrics

        def apply_step(params, opt_state, acc, n_batches):
            grads = jax.tree.map(lambda g: g / n_batches, acc)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = jax.tree.map(lambda p, u: p + u, params, updates)
            return params, opt_state

        self._train_step = jax.jit(train_step, donate_argnums=(0, 1))
        self._train_scan = jax.jit(train_scan, donate_argnums=(0, 1))
        self._val_step = jax.jit(val_step)
        self._val_scan = jax.jit(val_scan)
        self._grad_step = jax.jit(grad_step, donate_argnums=(1,))
        self._apply_step = jax.jit(apply_step, donate_argnums=(0, 1, 2))
        self._zero_grads = jax.jit(lambda p: jax.tree.map(jnp.zeros_like, p))

    def _resolve_spd(self) -> int:
        """Steps per dispatch. "auto" sizes K so the stacked [K, B, ...]
        chunk stays ≤1 GB (K up to 256 — the ~29 ms tunnel dispatch RTT
        amortizes as RTT/K, measured 1.918→1.081 ms/step from K=32→256 at
        B=8 with the knee at 256; BASELINE.md K-sweep table) and never
        exceeds the number of full train batches per epoch (a chunk that
        can't fill would silently disable the scan path)."""
        cfg = self.cfg
        if cfg.steps_per_dispatch != "auto":
            return max(1, int(cfg.steps_per_dispatch))
        bs = self.dm.train_batch_size
        n_full = self.dm.n_train // max(bs, 1)
        by_mem = SPD_CHUNK_BUDGET_BYTES // max(1, self.dm.batch_nbytes(bs))
        return max(1, min(SPD_MAX_STEPS, by_mem, n_full))

    def _place_opt_state(self, opt_state):
        """Replicate, or shard the moment vectors over ICI when ZeRO-1 is on."""
        if self.cfg.zero1:
            from multimodal_mtrssm_tpu.train.optim import shard_opt_state

            return shard_opt_state(opt_state, self.mesh)
        return replicate(opt_state, self.mesh)

    # ---- fit -----------------------------------------------------------------
    def fit(self, resume: bool = False, resume_from: str | Path | None = None) -> dict[str, Any]:
        """Train. ``resume=True`` continues from this run's ``last``
        checkpoint. ``resume_from`` (Lightning's ``fit(ckpt_path=…)``)
        accepts ANY checkpoint directory — a run's ``checkpoints`` dir
        (prefers ``last``, falls back to ``best``) or a specific
        ``checkpoints/<name>`` path. A full-state checkpoint (params +
        optimizer + scheduler counters) resumes exactly; a params-only
        checkpoint (e.g. ``best``) warm-starts the weights with a fresh
        optimizer/scheduler from epoch 0.

        Returns params/opt_state/history/best_val plus ``preempted``:
        True when a SIGTERM stopped the run early (a resume checkpoint
        was saved; rerun with ``resume=True`` to continue)."""
        cfg = self.cfg
        key = jax.random.PRNGKey(cfg.seed)
        key, k_init = jax.random.split(key)
        params = self.model.init(k_init)
        opt_state = self.optimizer.init(params)
        params = replicate(params, self.mesh)
        opt_state = self._place_opt_state(opt_state)
        sched_spec = cfg.lr_scheduler or {
            "kind": "plateau", "factor": cfg.plateau_factor,
            "patience": cfg.plateau_patience, "min_lr": cfg.plateau_min_lr,
            "threshold": cfg.plateau_threshold,
        }
        scheduler = make_scheduler(sched_spec, cfg.learning_rate)
        early_stop = EarlyStopping(cfg.early_stop_patience, min_delta=cfg.early_stop_min_delta)
        start_epoch = 0
        best_val = float("inf")

        resume_mid = None
        global_step = 0
        src = None  # (manager, name) to restore from
        if resume_from is not None:
            p = Path(resume_from)
            if not p.exists():
                raise FileNotFoundError(f"resume_from checkpoint not found: {p}")
            if (p / "last").exists() or (p / "best").exists():
                mgr = CheckpointManager(p)
                src = (mgr, "last" if mgr.exists("last") else "best")
            else:
                src = (CheckpointManager(p.parent), p.name)
        elif resume and self.ckpt.exists("last"):
            src = (self.ckpt, "last")
        if src is not None:
            mgr, name = src
            try:
                state, aux = mgr.restore(name, {"params": params, "opt_state": opt_state})
                has_full = "scheduler" in aux
            except Exception as restore_exc:
                if resume_from is None:
                    raise
                # No optimizer state in the checkpoint (or an incompatible
                # optimizer config): params-only restore. restore_params also
                # handles full-state checkpoints whose opt_state doesn't match
                # this run's optimizer (raw restore + params extraction).
                # The triggering exception is surfaced so an INCIDENTAL
                # restore failure on a genuinely full checkpoint (corrupt
                # opt_state file, orbax version skew) is visible instead of
                # being silently reinterpreted as "params-only checkpoint".
                print(
                    "full-state restore failed "
                    f"({type(restore_exc).__name__}: {restore_exc}); "
                    "falling back to a params-only warm start"
                )
                p_only, aux = mgr.restore_params(name, params)
                state = {"params": p_only}
                has_full = False
            params = replicate(state["params"], self.mesh)
            if not has_full:
                # Params-only warm start (e.g. another run's "best"): fresh
                # optimizer/scheduler, epochs from 0 in THIS run's log dir.
                print(f"warm start: params from {mgr.dir / name}")
            else:
                opt_state = self._place_opt_state(state["opt_state"])
                scheduler = scheduler_from_state_dict(aux["scheduler"])
                early_stop = EarlyStopping.from_state_dict(aux["early_stop"])
                if aux.get("mid_epoch"):
                    # Step-granular preemption resume: continue the interrupted
                    # epoch right after the last APPLIED optimizer step (the data
                    # stream is deterministic per epoch; consumed items are
                    # regenerated and skipped, so no batch trains twice). The
                    # interrupted run's key BASIS is restored from the aux (it is
                    # NOT always derivable from the seed — an epoch-boundary
                    # resume reseeds, trainer line below), so with global_step
                    # restored the continued steps are BIT-IDENTICAL to the run
                    # that was interrupted.
                    start_epoch = aux["epoch"]
                    resume_mid = aux
                    if "key_base" in aux:
                        key = jnp.asarray(aux["key_base"], dtype=jnp.uint32)
                    else:  # pre-key_base checkpoint: fresh-run reconstruction
                        key = jax.random.split(jax.random.PRNGKey(cfg.seed))[0]
                else:
                    start_epoch = aux["epoch"] + 1
                    key = jax.random.PRNGKey(cfg.seed + start_epoch * 9973)
                best_val = aux.get("best_val", float("inf"))
                global_step = int(aux.get("global_step", 0))

        history = []
        bsh = batch_sharding(self.mesh)
        ssh = stacked_batch_sharding(self.mesh)
        preempt = _PreemptionGuard()
        preempt.__enter__()
        try:
            for epoch in range(start_epoch, cfg.max_epochs):
                if cfg.profile_epoch is not None and epoch == cfg.profile_epoch:
                    jax.profiler.start_trace(str(Path(cfg.log_dir) / "profile"))
                t0 = time.time()
                # One device key per epoch; per-step keys fold in the step index
                # inside the jitted step (single RNG transfer per epoch).
                epoch_key = jax.random.fold_in(key, epoch)
                # Epoch means are SAMPLE-weighted (Lightning's log_dict weights
                # by batch size), so the ragged tail batch contributes
                # proportionally, not equally.
                train_metrics, n_train_eps = {}, 0
                accum = max(1, cfg.accumulate_grad_batches)
                acc_grads, window = None, 0
                spd = self._resolve_spd()
                stream_pos = 0  # items consumed from this epoch's (chunked) stream
                skip = 0
                if resume_mid is not None and epoch == start_epoch:
                    # Continue the interrupted epoch: restore its partial metric
                    # sums and skip the already-trained stream prefix. The
                    # stream position is measured in chunk items, so the
                    # interrupted run's K governs this epoch's chunking even
                    # if steps_per_dispatch changed in between.
                    # items_done counts chunk items on the fast path but raw
                    # batches on the accumulation path — the two skip
                    # semantics are incompatible, so a changed
                    # accumulate_grad_batches must refuse, not mis-skip.
                    if "accum" in resume_mid:
                        saved_accum = int(resume_mid["accum"])
                        if saved_accum != accum:
                            raise ValueError(
                                f"mid-epoch resume checkpoint was saved with "
                                f"accumulate_grad_batches={saved_accum} but the trainer is "
                                f"configured with {accum}; resume with the original value "
                                f"(the stream skip offset is only valid under it)"
                            )
                    else:
                        # Aux saved before the guard existed: the mode is
                        # unrecorded, so trust the configured value rather
                        # than hard-blocking a previously-resumable run.
                        warnings.warn(
                            "mid-epoch checkpoint predates the accumulate_grad_batches "
                            f"guard; assuming it was saved with the configured value ({accum})",
                            stacklevel=2,
                        )
                    skip = stream_pos = int(resume_mid["items_done"])
                    spd = int(resume_mid.get("spd", spd))
                    train_metrics = dict(resume_mid.get("partial_metrics", {}))
                    n_train_eps = int(resume_mid.get("n_train_eps", 0))
                    resume_mid = None
                if accum == 1:
                    # Fast path: chunked stream — ("scan", [K,B,...]) chunks when
                    # spd > 1, plain ("step", batch) items otherwise (the chunked
                    # stream with k=1 IS the per-batch stream; equivalence-tested).
                    for kind, payload in self.dm.train_batches_chunked(
                        epoch, spd, device=bsh, stacked_device=ssh, skip=skip
                    ):
                        if kind == "scan":
                            k, bs = payload[0].shape[0], payload[0].shape[1]
                            params, opt_state, metrics = self._train_scan(
                                params, opt_state, payload, epoch_key, global_step
                            )
                        else:
                            k, bs = 1, payload[0].shape[0]
                            params, opt_state, metrics = self._train_step(
                                params, opt_state, payload, epoch_key, global_step
                            )
                        _accumulate(train_metrics, metrics, weight=bs)
                        n_train_eps += bs * k
                        global_step += k
                        stream_pos += 1
                        if preempt.flagged:
                            break
                else:
                    # Window metrics/episode counts are buffered and committed
                    # only when the window's optimizer step applies, so a
                    # preempted partial window is replayed on resume without
                    # double-counting.
                    window_buf: list[tuple[dict, int]] = []
                    for batch in self.dm.train_batches(epoch, device=bsh, skip=skip):
                        bs = batch[0].shape[0]
                        if acc_grads is None:
                            acc_grads = self._zero_grads(params)
                        acc_grads, metrics = self._grad_step(
                            params, acc_grads, batch, epoch_key, global_step
                        )
                        window += 1
                        window_buf.append((metrics, bs))
                        global_step += 1
                        if window == accum:
                            params, opt_state = self._apply_step(
                                params, opt_state, acc_grads, float(window)
                            )
                            for m, b in window_buf:
                                _accumulate(train_metrics, m, weight=b)
                                n_train_eps += b
                            stream_pos += window
                            acc_grads, window, window_buf = None, 0, []
                        if preempt.flagged:
                            break
                    if acc_grads is not None and window and not preempt.flagged:
                        # Lightning steps on the epoch's leftover window too.
                        params, opt_state = self._apply_step(
                            params, opt_state, acc_grads, float(window)
                        )
                        for m, b in window_buf:
                            _accumulate(train_metrics, m, weight=b)
                            n_train_eps += b
                        stream_pos += window
                def _save_last(epoch_, global_step_, name="last", **extra):
                    """One checkpoint shape for every full-state save site (the
                    resume path depends on these fields staying in sync)."""
                    self.ckpt.save(
                        name,
                        {"params": params, "opt_state": opt_state},
                        {
                            "epoch": epoch_,
                            "global_step": global_step_,
                            "best_val": best_val,
                            "key_base": np.asarray(key).tolist(),
                            "scheduler": scheduler.state_dict(),
                            "early_stop": early_stop.state_dict(),
                            **extra,
                        },
                    )

                if preempt.flagged:
                    # Preemption (SIGTERM): save a step-granular exact-resume
                    # checkpoint — params/optimizer state after the last APPLIED
                    # step plus the stream position; resume=True continues this
                    # epoch from the next batch. (A preempted partial
                    # accumulation window is discarded and replayed.)
                    _save_last(
                        epoch, global_step - window,
                        mid_epoch=True,
                        items_done=stream_pos,
                        spd=spd,
                        accum=accum,
                        n_train_eps=n_train_eps,
                        partial_metrics={k: float(v) for k, v in train_metrics.items()},
                    )
                    print(
                        f"preemption: saved step-granular resume checkpoint "
                        f"(epoch {epoch}, {stream_pos} stream items applied), stopping"
                    )
                    break
                # Fence with a host transfer, not block_until_ready: on this
                # backend block_until_ready can return before enqueued work
                # completes (BASELINE.md timing note), making seq_per_sec
                # optimistic. One accumulated scalar depends on every step.
                if train_metrics:
                    float(next(iter(train_metrics.values())))
                epoch_time = time.time() - t0

                val_key = jax.random.fold_in(epoch_key, 0x5EED)
                val_metrics, n_val_eps, n_val = {}, 0, 0
                for kind, payload in self.dm.val_batches_chunked(spd, device=bsh, stacked_device=ssh):
                    if kind == "scan":
                        k, bs = payload[0].shape[0], payload[0].shape[1]
                        metrics = self._val_scan(params, payload, val_key, n_val)
                    else:
                        k, bs = 1, payload[0].shape[0]
                        metrics = self._val_step(params, payload, val_key, n_val)
                    _accumulate(val_metrics, metrics, weight=bs)
                    n_val_eps += bs * k
                    n_val += k
                if cfg.profile_epoch is not None and epoch == cfg.profile_epoch:
                    jax.profiler.stop_trace()

                row = {f"train/{k}": float(v) / max(n_train_eps, 1) for k, v in train_metrics.items()}
                row.update({f"val/{k}": float(v) / max(n_val_eps, 1) for k, v in val_metrics.items()})
                seq_per_s = n_train_eps / max(epoch_time, 1e-9)
                row.update({"epoch": epoch, "lr": scheduler.lr, "seq_per_sec": seq_per_s})
                self.logger.log(row, step=epoch)
                history.append(row)

                bad = [k for k, v in row.items()
                       if k.startswith(("train/", "val/")) and not math.isfinite(v)]
                if cfg.halt_on_non_finite and bad:
                    # Same aux shape as 'last' (global_step/key_base included)
                    # so fit(resume_from=…/diverged) resumes exactly.
                    _save_last(epoch, global_step, name="diverged", non_finite=bad)
                    advice = (
                        "resume from 'last' with a lower learning rate"
                        if self.ckpt.exists("last")
                        else "restart with a lower learning rate (no 'last' checkpoint exists yet)"
                    )
                    print(
                        f"divergence: non-finite metrics {bad} at epoch {epoch}; "
                        f"saved 'diverged' diagnostic checkpoint and halting — {advice}"
                    )
                    break

                monitored = row.get("val/loss", row.get("train/loss", float("inf")))
                prev_lr = scheduler.lr
                new_lr = scheduler.step(monitored)
                if new_lr != prev_lr:
                    opt_state = set_learning_rate(opt_state, new_lr)

                if monitored < best_val:
                    best_val = monitored
                    self.ckpt.save("best", {"params": params}, {"epoch": epoch, "val_loss": monitored})
                if (epoch + 1) % cfg.checkpoint_every_n_epochs == 0 or epoch == cfg.max_epochs - 1:
                    _save_last(epoch, global_step)
                for cb in self.callbacks:
                    cb(self, epoch, params, row)
                if early_stop.step(monitored):
                    # Capture the true final state (the periodic save above may
                    # be up to checkpoint_every_n_epochs-1 epochs stale).
                    _save_last(epoch, global_step)
                    break
                if preempt.flagged:
                    # SIGTERM landed during validation/bookkeeping: the epoch
                    # is COMPLETE, so save an epoch-boundary resume checkpoint
                    # now instead of training into the next epoch (the flag
                    # would otherwise only be polled after its first chunk).
                    _save_last(epoch, global_step)
                    print(f"preemption: saved resume checkpoint after epoch {epoch}, stopping")
                    break

        finally:
            # Restore the SIGTERM disposition even when fit() raises
            # (a leaked no-op handler would swallow later SIGTERMs).
            preempt.__exit__()
        # Reference on_train_end hook: final viz/cleanup with the BEST
        # checkpoint, also after early stopping (reference callback.py:194-210).
        for cb in self.callbacks:
            hook = getattr(cb, "on_train_end", None)
            if hook is not None:
                hook(self, self.load_best_params(params))

        try:
            from multimodal_mtrssm_tpu.viz.charts import render_combined_charts

            for png in render_combined_charts(self.logger.path) or []:
                self.logger.log_image(f"charts/{Path(png).stem}", png)
        except Exception:  # chart rendering must never fail a run
            pass
        self.logger.close()
        # "preempted" lets orchestration (and tests) distinguish a completed
        # fit from one a SIGTERM stopped early — a preempted run returns a
        # shorter history that is otherwise indistinguishable from a small
        # max_epochs (observed 2026-08-19: a stray environment SIGTERM turned
        # a numerics-comparison test failure into a head-scratcher).
        return {"params": params, "opt_state": opt_state, "history": history,
                "best_val": best_val, "preempted": preempt.flagged}

    # ---- inference helpers -------------------------------------------------
    def load_best_params(self, params_template: Any) -> Any:
        """Reference ``load_best_model_checkpoint`` (``callback.py:505-539``):
        load the best ckpt, falling back to the given params on failure."""
        try:
            state, _ = self.ckpt.restore("best", {"params": params_template})
            return state["params"]
        except Exception:
            return params_template


def _accumulate(acc: dict, metrics: dict[str, jax.Array], weight: float = 1.0) -> None:
    """Accumulate weight·metric on device (async) — the host sync happens
    once per epoch when the row is formatted, not per step."""
    for k, v in metrics.items():
        acc[k] = acc.get(k, 0.0) + weight * v
