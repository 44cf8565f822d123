"""PyTorch baseline: architecture-faithful reference train step, timed.

The reference (Mamo1031/Multimodal-MTRSSM) publishes no benchmark numbers
(BASELINE.md) and its pinned dependency stack (lightning, torchrl, the
``cnn`` / ``distribution-extension`` git packages) is not installed in this
image — so this script reimplements the reference's MoPoE-MRSSM compute
graph in plain torch from the behavioral spec (SURVEY.md §2/§3; reference
``mopoe_mrssm/core.py``, ``networks.py``, ``objective.py``) and times the
full train step (forward ELBO + backward + AdamW step) at the headline
config: batch 8, T=30, 32×32×1 frames, deter 32, stoch 4×4.

This is a benchmark harness, not framework code: it exists to produce the
``vs_baseline`` denominator for bench.py on whatever hardware torch has
available here (CPU in this image; CUDA if present).

Usage: python benchmarks/torch_reference_bench.py [--iters 20]
Prints one JSON line {"metric": "torch_reference_train_seq_per_s", ...}.
"""

from __future__ import annotations

import argparse
import json
import time

import torch
import torch.nn.functional as F
from torch import nn

B, T = 8, 30
DETER, HIDDEN, EMBED, ACT_DIM = 32, 32, 64, 6
CLASSES, CATS = 4, 4
STOCH = CLASSES * CATS


def mlp(in_dim, out_dim, cells, act=nn.ELU):
    return nn.Sequential(nn.Linear(in_dim, cells), act(), nn.Linear(cells, out_dim))


class CoordConvEncoder(nn.Module):
    """Conv encoder per the reference config (channels 8/16/32 k3 s2 p1,
    3 residual blocks @64, coord_conv, linear head 64)."""

    def __init__(self):
        super().__init__()
        chans = [3, 8, 16, 32]  # 1 input + 2 coord channels
        self.convs = nn.ModuleList(
            [nn.Conv2d(chans[i], chans[i + 1], 3, 2, 1) for i in range(3)]
        )
        self.res_proj = nn.Conv2d(32, 64, 1)
        self.res = nn.ModuleList(
            [nn.ModuleList([nn.Conv2d(64, 64, 3, 1, 1), nn.Conv2d(64, 64, 3, 1, 1)]) for _ in range(3)]
        )
        self.head = nn.Linear(64 * 4 * 4, EMBED)

    def forward(self, x):  # [N, 1, 32, 32]
        n, _, h, w = x.shape
        ys = torch.linspace(-1, 1, h, device=x.device).view(1, 1, h, 1).expand(n, 1, h, w)
        xs = torch.linspace(-1, 1, w, device=x.device).view(1, 1, 1, w).expand(n, 1, h, w)
        x = torch.cat([x, ys, xs], dim=1)
        for c in self.convs:
            x = F.elu(c(x))
        x = F.elu(self.res_proj(x))
        for c1, c2 in self.res:
            x = F.elu(x + c2(F.elu(c1(x))))
        return self.head(x.flatten(1))


class Decoder(nn.Module):
    """Decoder per the reference config (linear 64→1024, reshape 64×4×4,
    3 residual blocks @64/128, deconv 32/16/1 k4 s2 p1, Tanh)."""

    def __init__(self, in_features):
        super().__init__()
        self.lin1 = nn.Linear(in_features, 64)
        self.lin2 = nn.Linear(64, 1024)
        self.res = nn.ModuleList(
            [nn.ModuleList([nn.Conv2d(64, 128, 3, 1, 1), nn.Conv2d(128, 64, 3, 1, 1)]) for _ in range(3)]
        )
        self.deconvs = nn.ModuleList(
            [nn.ConvTranspose2d(64, 32, 4, 2, 1), nn.ConvTranspose2d(32, 16, 4, 2, 1),
             nn.ConvTranspose2d(16, 1, 4, 2, 1)]
        )

    def forward(self, f):  # [N, F]
        x = F.elu(self.lin2(F.elu(self.lin1(f)))).view(-1, 64, 4, 4)
        for c1, c2 in self.res:
            x = F.elu(x + c2(F.elu(c1(x))))
        x = F.elu(self.deconvs[0](x))
        x = F.elu(self.deconvs[1](x))
        return torch.tanh(self.deconvs[2](x))


class TorchMoPoEMRSSM(nn.Module):
    def __init__(self):
        super().__init__()
        self.audio_encoder = CoordConvEncoder()
        self.vision_encoder = CoordConvEncoder()
        self.audio_decoder = Decoder(DETER + STOCH)
        self.vision_decoder = Decoder(DETER + STOCH)
        self.action_state_projector = mlp(ACT_DIM + STOCH, HIDDEN, HIDDEN)
        self.gru = nn.GRUCell(HIDDEN, DETER)
        self.rnn_to_prior = mlp(DETER, STOCH, HIDDEN)
        self.audio_rep = mlp(DETER + EMBED, STOCH, HIDDEN)
        self.vision_rep = mlp(DETER + EMBED, STOCH, HIDDEN)
        # reference init_proj omits activation_class ⇒ torchrl default Tanh
        self.init_proj = mlp(EMBED, DETER, 200, act=nn.Tanh)

    @staticmethod
    def _rsample(logits):
        # straight-through one-hot over 4 blocks of 4
        b = logits.shape[:-1]
        bl = logits.view(*b, CLASSES, CATS)
        probs = F.softmax(bl, dim=-1)
        idx = torch.distributions.Categorical(logits=bl).sample()
        onehot = F.one_hot(idx, CATS).float()
        return (onehot + probs - probs.detach()).view(*b, STOCH)

    @staticmethod
    def _mopoe(a_logits, v_logits):
        a = F.log_softmax(a_logits, dim=-1)
        v = F.log_softmax(v_logits, dim=-1)
        fused = a + v
        import math

        stacked = torch.stack([a, v, fused], dim=-2) + math.log(1.0 / 3.0)
        return torch.logsumexp(stacked, dim=-2)

    def forward(self, batch):
        action, audio, vision = batch[0], batch[1], batch[2]
        bsz = action.shape[0]
        a_emb = self.audio_encoder(audio.flatten(0, 1)).view(bsz, T, EMBED)
        v_emb = self.vision_encoder(vision.flatten(0, 1)).view(bsz, T, EMBED)
        embed0 = (a_emb[:, 0] + v_emb[:, 0]) / 2.0
        deter = self.init_proj(embed0)
        stoch = self._rsample(self.rnn_to_prior(deter))
        post_logits_all, prior_logits_all, feats = [], [], []
        for t in range(T):
            x = self.action_state_projector(torch.cat([action[:, t], stoch], -1))
            deter = self.gru(x, deter)
            prior_logits = self.rnn_to_prior(deter)
            a_logits = self.audio_rep(torch.cat([deter, a_emb[:, t]], -1))
            v_logits = self.vision_rep(torch.cat([deter, v_emb[:, t]], -1))
            mixed = self._mopoe(a_logits, v_logits)
            stoch = self._rsample(mixed)
            post_logits_all.append(mixed)
            prior_logits_all.append(prior_logits)
            feats.append(torch.cat([deter, stoch], -1))
        feats = torch.stack(feats, 1)  # [B, T, 48]
        post = torch.stack(post_logits_all, 1)
        prior = torch.stack(prior_logits_all, 1)
        a_rec = self.audio_decoder(feats.flatten(0, 1)).view(bsz, T, 1, 32, 32)
        v_rec = self.vision_decoder(feats.flatten(0, 1)).view(bsz, T, 1, 32, 32)

        def nll(pred, tgt):
            d = torch.distributions.Independent(torch.distributions.Normal(pred, 1.0), 3)
            return -d.log_prob(tgt).mean()

        recon = nll(a_rec, batch[4]) + nll(v_rec, batch[5])

        def kl(q, p):
            ql = F.log_softmax(q.view(*q.shape[:-1], CLASSES, CATS), -1)
            pl = F.log_softmax(p.view(*p.shape[:-1], CLASSES, CATS), -1)
            return (ql.exp() * (ql - pl)).sum((-2, -1))

        kl_bt = 0.8 * kl(post.detach(), prior) + 0.2 * kl(post, prior.detach())
        kl_total = kl_bt.sum(-1).mean()
        # Components for the curve-parity harness (benchmarks/curve_parity.py);
        # scalar forward() return is unchanged for the throughput bench.
        self.last_metrics = {"recon": float(recon), "kl": float(kl_total)}
        return recon + kl_total


class TorchMTRNN(nn.Module):
    """Leaky-integrator cell (reference mopoe_mmtrssm/core.py:40-74 math)."""

    def __init__(self, input_dim, hidden_dim, tau):
        super().__init__()
        self.d2h = nn.Linear(hidden_dim, hidden_dim)
        self.in2h = nn.Linear(input_dim, hidden_dim)
        self.tau = tau

    def forward(self, x, prev_d, hidden):
        hidden = (1 - 1 / self.tau) * hidden + (self.d2h(prev_d) + self.in2h(x)) / self.tau
        return torch.tanh(hidden), hidden


class TorchMoPoEMMTRSSM(nn.Module):
    """Architecture-faithful hierarchical variant (reference
    mopoe_mmtrssm/core.py:77-610) for the cross-framework golden test."""

    HD = LD = 32
    HS = LS = 16
    L_TAU, H_TAU = 2.0, 4.0

    def __init__(self):
        super().__init__()
        self.audio_encoder = CoordConvEncoder()
        self.vision_encoder = CoordConvEncoder()
        feat = self.HD + self.HS + self.LD + self.LS  # 96
        self.audio_decoder = Decoder(feat)
        self.vision_decoder = Decoder(feat)
        self.l_rnn = TorchMTRNN(ACT_DIM + self.LS + self.HS, self.LD, self.L_TAU)
        self.h_rnn = TorchMTRNN(self.HS, self.HD, self.H_TAU)
        self.l_prior = mlp(self.LD, self.LS, 32)
        self.h_prior = mlp(self.HD, self.HS, 32)
        self.h_posterior = mlp(self.LD + self.HD, self.HS, 32)
        self.audio_rep = mlp(self.LD + EMBED, self.LS, 32)
        self.vision_rep = mlp(self.LD + EMBED, self.LS, 32)
        self.init_proj = mlp(EMBED, self.HD + self.LD, 200, act=nn.Tanh)
        self.w_kl_h = 1.0

    @staticmethod
    def _rsample(logits, classes, cats):
        b = logits.shape[:-1]
        bl = logits.view(*b, classes, cats)
        probs = torch.softmax(bl, dim=-1)
        idx = torch.distributions.Categorical(logits=bl).sample()
        onehot = torch.nn.functional.one_hot(idx, cats).float()
        return (onehot + probs - probs.detach()).view(*b, classes * cats)

    def forward(self, batch):
        import math

        F = torch.nn.functional
        action, audio, vision = batch[0], batch[1], batch[2]
        bsz, T_ = action.shape[0], action.shape[1]
        a_emb = self.audio_encoder(audio.flatten(0, 1)).view(bsz, T_, EMBED)
        v_emb = self.vision_encoder(vision.flatten(0, 1)).view(bsz, T_, EMBED)
        h = self.init_proj((a_emb[:, 0] + v_emb[:, 0]) / 2.0)
        hd, ld = h[:, : self.HD], h[:, self.HD :]
        hidh, hidl = hd, ld
        hs = self._rsample(self.h_prior(hd), 2, 8)
        ls = self._rsample(self.l_prior(ld), 4, 4)
        feats, l_post_all, l_prior_all, h_post_all, h_prior_all = [], [], [], [], []
        for t in range(T_):
            l_in = torch.cat([action[:, t], ls, hs], -1)
            l_deter, hidl = self.l_rnn(l_in, ld, hidl)
            l_prior_logits = self.l_prior(l_deter)
            a_logits = self.audio_rep(torch.cat([l_deter, a_emb[:, t]], -1))
            v_logits = self.vision_rep(torch.cat([l_deter, v_emb[:, t]], -1))
            a_lp = F.log_softmax(a_logits, -1)
            v_lp = F.log_softmax(v_logits, -1)
            mixed = torch.logsumexp(
                torch.stack([a_lp, v_lp, a_lp + v_lp], -2) + math.log(1 / 3), -2
            )
            ls = self._rsample(mixed, 4, 4)
            h_deter, hidh = self.h_rnn(hs, hd, hidh)
            h_prior_logits = self.h_prior(h_deter)
            h_post_logits = self.h_posterior(torch.cat([l_deter, h_deter], -1))
            hs = self._rsample(h_post_logits, 2, 8)
            hd, ld = h_deter, l_deter
            feats.append(torch.cat([h_deter, hs, l_deter, ls], -1))
            l_post_all.append(mixed)
            l_prior_all.append(l_prior_logits)
            h_post_all.append(h_post_logits)
            h_prior_all.append(h_prior_logits)
        feats = torch.stack(feats, 1)
        a_rec = self.audio_decoder(feats.flatten(0, 1)).view(bsz, T_, 1, 32, 32)
        v_rec = self.vision_decoder(feats.flatten(0, 1)).view(bsz, T_, 1, 32, 32)

        def nll(pred, tgt):
            d = torch.distributions.Independent(torch.distributions.Normal(pred, 1.0), 3)
            return -d.log_prob(tgt).mean()

        recon = nll(a_rec, batch[4]) + nll(v_rec, batch[5])

        def kl(q, p, classes, cats):
            ql = F.log_softmax(torch.stack(q, 1).view(bsz, T_, classes, cats), -1)
            pl = F.log_softmax(torch.stack(p, 1).view(bsz, T_, classes, cats), -1)
            return (ql.exp() * (ql - pl)).sum((-2, -1))

        def balanced(q, p, classes, cats):
            qs = [x.detach() for x in q]
            ps = [x.detach() for x in p]
            return 0.8 * kl(qs, p, classes, cats) + 0.2 * kl(q, ps, classes, cats)

        kl_l = balanced(l_post_all, l_prior_all, 4, 4).sum(-1).mean()
        kl_h = balanced(h_post_all, h_prior_all, 2, 8).sum(-1).mean()
        # Same keys as the JAX shared_step: "kl" is the low-level KL, the
        # weighted high-level KL folds into the loss (mmtrssm.py:556-558).
        self.last_metrics = {"recon": float(recon), "kl": float(kl_l)}
        return recon + kl_l + self.w_kl_h * kl_h


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--warmup", type=int, default=3)
    args = ap.parse_args()
    device = "cuda" if torch.cuda.is_available() else "cpu"
    torch.manual_seed(0)
    model = TorchMoPoEMRSSM().to(device)
    opt = torch.optim.AdamW(model.parameters(), lr=1e-3)
    batch = (
        torch.randn(B, T, ACT_DIM, device=device),
        torch.rand(B, T, 1, 32, 32, device=device) * 2 - 1,
        torch.rand(B, T, 1, 32, 32, device=device) * 2 - 1,
        torch.randn(B, T, ACT_DIM, device=device),
        torch.rand(B, T, 1, 32, 32, device=device) * 2 - 1,
        torch.rand(B, T, 1, 32, 32, device=device) * 2 - 1,
    )

    def step():
        opt.zero_grad(set_to_none=True)
        loss = model(batch)
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 10.0)
        opt.step()
        return loss

    for _ in range(args.warmup):
        step()
    if device == "cuda":
        torch.cuda.synchronize()
    t0 = time.perf_counter()
    for _ in range(args.iters):
        loss = step()
    if device == "cuda":
        torch.cuda.synchronize()
    dt = (time.perf_counter() - t0) / args.iters
    print(json.dumps({
        "metric": "torch_reference_train_seq_per_s",
        "value": round(B / dt, 2),
        "unit": "seq/s",
        "device": device,
        "loss": round(float(loss), 2),
    }))


if __name__ == "__main__":
    main()
