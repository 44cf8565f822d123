"""Pallas TPU kernels for the recurrence hot paths."""

import jax

from multimodal_mtrssm_tpu.ops.pallas.rollout import fused_rollout_transition, pack_params
from multimodal_mtrssm_tpu.ops.pallas.rollout_mt import (
    fused_mt_rollout_transition,
    pack_mt_params,
)
from multimodal_mtrssm_tpu.ops.pallas.train_step import (
    fits_vmem,
    fused_train_recurrence,
    pack_train_params,
    reference_train_recurrence,
)
from multimodal_mtrssm_tpu.ops.pallas.train_step_stacked import (
    fused_train_recurrence_stacked,
    stack_train_params,
)
from multimodal_mtrssm_tpu.ops.pallas.train_step_mt import (
    fits_vmem_mt,
    fused_mt_train_recurrence,
    pack_mt_train_params,
    reference_mt_train_recurrence,
)


def default_use_pallas(kind: str, batch: int, horizon: int) -> bool:
    """Shape-based kernel-vs-XLA dispatch for ``use_pallas="auto"``.

    Crossovers measured on 1× v5e (BASELINE.md imagination tables,
    re-measured 2026-08-16): the hierarchical (MT) kernel wins at every
    measured shape; the MRSSM kernel wins from moderate batch·horizon up
    (1.2-1.5×) and is a wash at tiny shapes, so "auto" keeps tiny rollouts
    on XLA. Pallas kernels only exist for the TPU backend — any other
    platform always gets XLA.
    """
    if jax.default_backend() != "tpu":
        return False
    if kind == "mt":
        return True
    return batch * horizon >= 256


def resolve_use_pallas(use_pallas: bool | str, kind: str, batch: int, horizon: int,
                       activation: str = "ELU") -> bool:
    """Resolve a ``use_pallas`` flag (True/False/"auto") to a concrete bool.

    The fused kernels implement the reference's ELU activation only
    (``rollout.py::_elu``); a model configured with any other
    ``activation_name`` must take the XLA path — silently fusing would
    compute different trajectories than the model.
    """
    if activation.lower() != "elu":
        if use_pallas is True:
            import warnings

            warnings.warn(
                f"use_pallas=True ignored: the fused kernels implement ELU, "
                f"model uses {activation!r}; falling back to XLA",
                stacklevel=2,
            )
        return False
    if use_pallas == "auto":
        return default_use_pallas(kind, batch, horizon)
    if use_pallas in (True, False):
        return use_pallas
    raise ValueError(
        f"use_pallas={use_pallas!r} not recognized; expected True, False, or 'auto'"
    )


def resolve_train_kernel_mode(
    v: bool | str | None, *, eligible: bool, auto_flag: bool, warn_ineligible: str,
    n_devices: int | None = None,
) -> str | None:
    """Resolve a ``use_pallas_train`` flag to a concrete mode (None = XLA
    scan). Shared by both model families so the dispatch ladder cannot
    drift between them.

    - ``False``/``None`` → None.
    - ``"interpret"``/``"reference"`` (debug/test modes) → themselves when
      the shape/config is eligible, else None.
    - ``"stacked"`` → the stacked-layout kernel variant
      (``train_step_stacked.py``, MRSSM only) with the same eligibility +
      single-device guards as ``True``; ``"stacked_interpret"`` is its
      debug/test mode (behaves like ``"interpret"``).
    - ``"auto"`` → ``"kernel"`` only when eligible AND the family's
      measured-win policy flag is on AND running single-chip on TPU (GSPMD
      cannot partition a bare ``pallas_call`` over a batch-sharded mesh, so
      multi-chip training keeps the XLA scan, which partitions
      automatically).
    - ``True`` → ``"kernel"`` when eligible, with the same single-device
      guard as "auto" (warns either way when falling back — an explicit
      True must never be ignored silently).
    - anything else → ``ValueError`` (a YAML typo like ``"false"`` or
      ``"atuo"`` must not silently pick a path).

    ``n_devices`` is the device count the caller actually trains on — the
    Trainer threads its resolved mesh size through the model's
    ``mesh_devices`` attribute, so an 8-device backend trimmed to a
    1-device mesh still gets the kernel fast path. ``None`` falls back to
    the global backend count (standalone model use outside a Trainer).
    """
    if n_devices is None:
        n_devices = len(jax.devices())
    if v in (False, None):
        return None
    if v in ("interpret", "reference", "stacked_interpret"):
        return v if eligible else None
    if v == "auto":
        if (eligible and auto_flag and jax.default_backend() == "tpu"
                and n_devices == 1):
            return "kernel"
        return None
    if v is True or v == "stacked":
        import warnings

        mode = "stacked" if v == "stacked" else "kernel"
        if not eligible:
            warnings.warn(warn_ineligible, stacklevel=4)
            return None
        if n_devices > 1:
            warnings.warn(
                f"use_pallas_train={v!r} ignored on a multi-device mesh: "
                "GSPMD cannot partition the fused training kernel over a "
                "batch-sharded mesh; taking the XLA scan path",
                stacklevel=4,
            )
            return None
        return mode
    raise ValueError(
        f"use_pallas_train={v!r} not recognized; expected True, False, None, "
        "'auto', 'interpret', 'reference', 'stacked', or 'stacked_interpret'"
    )


__all__ = [
    "default_use_pallas",
    "fits_vmem",
    "fits_vmem_mt",
    "fused_mt_rollout_transition",
    "fused_mt_train_recurrence",
    "fused_rollout_transition",
    "fused_train_recurrence",
    "fused_train_recurrence_stacked",
    "pack_mt_params",
    "pack_mt_train_params",
    "pack_params",
    "pack_train_params",
    "reference_mt_train_recurrence",
    "reference_train_recurrence",
    "resolve_train_kernel_mode",
    "resolve_use_pallas",
    "stack_train_params",
]
