"""Analytic HBM byte accounting for the MoPoE-MRSSM train step.

VERDICT r3 item 6: the BASELINE bandwidth-ceiling argument rested on XLA
``cost_analysis`` byte counts that are fusion-overcounted (nominal BW
>100%). This script derives HBM traffic from first principles instead, per
layer, and brackets the truth between two bounds:

- **packed**: every activation stored dense (the information-theoretic
  floor — what a perfect layout/fusion schedule would move). Per layer the
  forward reads its input and writes its output once (elementwise ops
  fused); the backward reads the saved input and the output grad and
  writes the input grad (weight-grad traffic is weight-sized, negligible
  here), i.e. bwd ≈ 2× the fwd unique-activation traffic.
- **lane-padded**: the same counts with the channel (minor-most, NHWC)
  dimension padded to the TPU's 128-lane register tile and the
  second-minor dim to 8 sublanes. Early conv layers have 1-32 channels, so
  padding inflates their bytes up to 128×. XLA's actual layouts fall
  between the bounds (it re-tiles small-channel convs, e.g.
  space-to-depth), which is exactly why its own byte counts overcount past
  100% of peak.

Implied ms/step at the v5e's 819 GB/s HBM peak is printed for both bounds
next to the measured step time — if measured sits near/below packed, the
step is NOT bandwidth-bound and schedule work can still win; if it sits
between the bounds, layout (channel packing) is the lever; at/above
lane-padded means something else dominates.

Pure arithmetic — runs anywhere, no TPU needed.

Usage: python benchmarks/roofline_bytes.py [--batch 128] [--t 30]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

HBM_PEAK_B_PER_S = 819e9  # TPU v5e


def _pad(c: int, to: int) -> int:
    return -(-c // to) * to


def _act_bytes(n: int, h: int, w: int, c: int, dtype_bytes: int, padded: bool) -> int:
    """Bytes of one [N, H, W, C] activation (NHWC: C is minor/lanes, W is
    second-minor/sublanes under the (8, 128) register tile)."""
    if padded:
        return n * h * _pad(w, 8) * _pad(c, 128) * dtype_bytes
    return n * h * w * c * dtype_bytes


def _vec_bytes(n: int, d: int, dtype_bytes: int, padded: bool) -> int:
    if padded:
        return _pad(n, 8) * _pad(d, 128) * dtype_bytes
    return n * d * dtype_bytes


def conv_stack_traffic(n_frames: int, dtype_bytes: int, padded: bool) -> dict[str, int]:
    """Forward read+write bytes through one modality's encoder AND decoder
    at the default configs (nn/conv.py EncoderConfig/DecoderConfig). Layer
    list mirrors encoder_apply/decoder_apply; elementwise (bias, ELU, tanh,
    coord concat) is assumed fused into the producing conv."""
    A = lambda h, w, c: _act_bytes(n_frames, h, w, c, dtype_bytes, padded)  # noqa: E731
    V = lambda d: _vec_bytes(n_frames, d, dtype_bytes, padded)  # noqa: E731

    layers: list[tuple[str, int, int]] = []  # (name, read, write)
    # --- encoder (32×32×1 input, coord_conv adds 2 channels) ---
    layers.append(("enc.coord_concat", A(32, 32, 1), A(32, 32, 3)))
    layers.append(("enc.conv1", A(32, 32, 3), A(16, 16, 8)))
    layers.append(("enc.conv2", A(16, 16, 8), A(8, 8, 16)))
    layers.append(("enc.conv3", A(8, 8, 16), A(4, 4, 32)))
    layers.append(("enc.res_proj", A(4, 4, 32), A(4, 4, 64)))
    for i in range(3):  # residual blocks: 64 → 64 (intermediate 64)
        layers.append((f"enc.res{i}.conv1", A(4, 4, 64), A(4, 4, 64)))
        layers.append((f"enc.res{i}.conv2", A(4, 4, 64), A(4, 4, 64)))
    layers.append(("enc.head", A(4, 4, 64), V(64)))
    # --- decoder (features 48 → 64 → 1024 → 4×4×64) ---
    layers.append(("dec.lin1", V(48), V(64)))
    layers.append(("dec.lin2", V(64), V(1024)))
    for i in range(3):  # residual blocks: 64 → 128 → 64
        layers.append((f"dec.res{i}.conv1", A(4, 4, 64), A(4, 4, 128)))
        layers.append((f"dec.res{i}.conv2", A(4, 4, 128), A(4, 4, 64)))
    layers.append(("dec.deconv1", A(4, 4, 64), A(8, 8, 32)))
    layers.append(("dec.deconv2", A(8, 8, 32), A(16, 16, 16)))
    layers.append(("dec.deconv3", A(16, 16, 16), A(32, 32, 1)))
    return {name: r + w for name, r, w in layers}


def recurrence_traffic(batch: int, t: int, padded: bool) -> int:
    """[B*T, d] activations of the T-step recurrence (f32): ~20 arrays of
    width ≤ 96 live in HBM between scan iterations on the XLA path."""
    n = batch * t
    widths = [22, 32, 32, 96, 96, 32, 32, 32, 16, 16, 16, 16, 16, 16, 16, 48]
    return sum(_vec_bytes(n, d, 4, padded) for d in widths)


def main() -> None:
    """Print the packed/lane-padded byte bounds and implied ms/step."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=30)
    ap.add_argument("--conv-dtype-bytes", type=int, default=2,
                    help="2 = bf16 conv stacks (the shipped default)")
    ap.add_argument("--measured-ms", type=float, default=None,
                    help="measured ms/step to compare against")
    ap.add_argument("--per-layer", action="store_true")
    args = ap.parse_args()

    frames = args.batch * args.t
    out = {}
    for padded in (False, True):
        conv = conv_stack_traffic(frames, args.conv_dtype_bytes, padded)
        fwd_conv = sum(conv.values()) * 2  # two modalities
        rec = recurrence_traffic(args.batch, args.t, padded)
        # NLL targets: read prediction + target per modality (f32 master).
        nll = 2 * 2 * _act_bytes(frames, 32, 32, 1, 4, padded)
        fwd = fwd_conv + rec + nll
        # Backward ≈ 2× forward activation traffic (read saved input + output
        # grad, write input grad); optimizer: params+grads+m+v read, params+
        # m+v write ≈ 7 × P × 4 B (P ≈ 2.6 M elements with both conv stacks).
        p_elems = 2_600_000
        opt = 7 * p_elems * 4
        total = fwd * 3 + opt
        key = "lane_padded" if padded else "packed"
        out[key] = {
            "fwd_conv_mb": round(fwd_conv / 1e6, 1),
            "recurrence_mb": round(rec / 1e6, 1),
            "total_mb_per_step": round(total / 1e6, 1),
            "implied_ms_at_819GBs": round(total / HBM_PEAK_B_PER_S * 1e3, 2),
        }
        if args.per_layer and padded:
            out["per_layer_padded_kb_per_frame"] = {
                k: round(v / frames / 1e3, 2) for k, v in conv.items()
            }
    if args.measured_ms is not None:
        out["measured_ms"] = args.measured_ms
        out["measured_vs_packed"] = round(
            args.measured_ms / out["packed"]["implied_ms_at_819GBs"], 2)
        out["measured_vs_lane_padded"] = round(
            args.measured_ms / out["lane_padded"]["implied_ms_at_819GBs"], 2)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
