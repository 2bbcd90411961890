"""Step-0 baseline: measure reference-equivalent CPU PyTorch throughput.

The reference itself cannot run in this environment (its deps — acids-rave,
TopoModelX — are not installed, and it has WIP call-signature bugs,
SURVEY §2.4). This proxy reconstructs the reference's *compute graph* in
plain torch from the SURVEY description — same layer shapes, same batch-1
CPU regime (trainer.py:63,93) — and times a full forward+backward step.
It exists only to anchor ``bench.py``'s ``vs_baseline`` in a measured
number rather than an estimate. This is an original implementation from
the architectural description, not reference code.

Prints one JSON line: {"metric": "reference_cpu_clips_per_sec", ...}.
"""

from __future__ import annotations

import json
import math
import time

import torch
import torch.nn as nn
import torch.nn.functional as F


def build_tables(n):
    import itertools

    import numpy as np

    edges = np.array(list(itertools.combinations(range(n), 2)))
    tris = np.array(list(itertools.combinations(range(n), 3)))
    tets = np.array(list(itertools.combinations(range(n), 4)))
    v2e = np.zeros((len(edges), n), dtype=np.float32)
    v2e[np.arange(len(edges))[:, None], edges] = 1
    e_lut = {tuple(e): i for i, e in enumerate(map(tuple, edges))}
    t_lut = {tuple(t): i for i, t in enumerate(map(tuple, tris))}
    e2t = np.zeros((len(tris), len(edges)), dtype=np.float32)
    for i, t in enumerate(map(tuple, tris)):
        for f in itertools.combinations(t, 2):
            e2t[i, e_lut[f]] = 1
    t2tt = np.zeros((len(tets), len(tris)), dtype=np.float32)
    for i, t in enumerate(map(tuple, tets)):
        for f in itertools.combinations(t, 3):
            t2tt[i, t_lut[f]] = 1
    return tuple(torch.from_numpy(m) for m in (v2e, e2t, t2tt))


class ProxyModel(nn.Module):
    """Shape-equivalent stand-in: per-band conv stacks, cross-band merge,
    temporal reduction, MLP to 6,195 logits, Gumbel+rectify, per-rank
    embeddings, 6-layer SCCN-style message passing, cross-attention,
    4 upsample blocks, 16-band synthesis conv."""

    def __init__(self, n=20, bands=16, c=64):
        super().__init__()
        self.n, self.bands, self.c = n, bands, c
        self.v2e, self.e2t, self.t2tt = build_tables(n)
        sizes = (n, self.v2e.shape[0], self.e2t.shape[0], self.t2tt.shape[0])
        self.sizes = sizes
        total = sum(sizes)
        # PQMF-cost stand-ins: 16-filter polyphase analysis/synthesis convs
        # with RAVE-like tap counts (~400 taps at 100 dB, 16 bands).
        self.pqmf_analysis = nn.Conv1d(1, bands, 400, stride=bands, padding=200)
        self.pqmf_synthesis = nn.ConvTranspose1d(
            bands, 1, 400, stride=bands, padding=200
        )
        self.band_procs = nn.ModuleList(
            [
                nn.Sequential(
                    nn.Conv1d(1, 8, 15, 2, 7), nn.GroupNorm(2, 8), nn.GELU(),
                    nn.Conv1d(8, 16, 7, 2, 3), nn.GroupNorm(4, 16), nn.GELU(),
                    nn.Conv1d(16, 16, 5, 2, 2), nn.GroupNorm(4, 16), nn.GELU(),
                )
                for _ in range(bands)
            ]
        )
        self.cross = nn.Sequential(
            nn.Conv1d(16 * bands, 192, 5, 1, 2, groups=4),
            nn.GroupNorm(12, 192), nn.GELU(),
            nn.Conv1d(192, 128, 7, 1, 3), nn.GroupNorm(8, 128), nn.GELU(),
        )
        self.reduce = nn.Sequential(
            nn.Conv1d(128, 128, 7, 4, 3, groups=8), nn.GroupNorm(8, 128), nn.GELU(),
            nn.Conv1d(128, 128, 7, 2, 3, groups=8), nn.GroupNorm(8, 128), nn.GELU(),
            nn.Conv1d(128, 128, 3, 2, 1), nn.GroupNorm(8, 128), nn.GELU(),
        )
        self.mlp = nn.Sequential(
            nn.Linear(4096, 2048), nn.LayerNorm(2048), nn.GELU(),
            nn.Linear(2048, 1024), nn.LayerNorm(1024), nn.GELU(),
            nn.Linear(1024, total),
        )
        self.embeds = nn.ParameterList(
            [nn.Parameter(torch.randn(s, c)) for s in sizes]
        )
        # 6 SCCN-ish layers x 4 ranks x 3 message convs
        self.msg = nn.ModuleList(
            [
                nn.ModuleList([nn.Linear(c, c, bias=False) for _ in range(12)])
                for _ in range(6)
            ]
        )
        self.attn = nn.MultiheadAttention(c, 4, batch_first=True)
        self.v2q = nn.Sequential(
            nn.Linear(c, 2 * c), nn.LayerNorm(2 * c), nn.GELU(),
            nn.Linear(2 * c, c), nn.LayerNorm(c), nn.GELU(),
        )
        ups = []
        chans = [c, c // 2, c // 4, bands]
        for i in range(4):
            ci, co = chans[i], chans[min(i + 1, 3)]
            ups.append(
                nn.Sequential(
                    nn.Upsample(scale_factor=2, mode="linear"),
                    nn.Conv1d(ci, ci, 3, 1, 1, groups=ci),
                    nn.Conv1d(ci, co, 1),
                    nn.GroupNorm(min(8, co), co), nn.GELU(),
                )
            )
        self.ups = nn.ModuleList(ups)

    def rectify(self, v, e, t, tt):
        eps = 1e-10
        ge = torch.exp(torch.log(v + eps) @ self.v2e.T / 2)
        e = torch.minimum(e, ge)
        gt = torch.exp(torch.log(e + eps) @ self.e2t.T / 3)
        t = torch.minimum(t, gt)
        gtt = torch.exp(torch.log(t + eps) @ self.t2tt.T / 4)
        tt = torch.minimum(tt, gtt)
        return v, e, t, tt

    def forward(self, x):  # x [1, 1, T]
        bands = self.pqmf_analysis(x)[..., : x.shape[-1] // self.bands]
        feats = [
            bp(bands[:, i : i + 1]) for i, bp in enumerate(self.band_procs)
        ]
        h = torch.cat(feats, dim=1)
        h = self.cross(h)
        h = self.reduce(h)
        logits = self.mlp(h.flatten(1))
        probs = torch.sigmoid(logits)[0]
        v, e, t, tt = torch.split(probs, list(self.sizes))
        ranks = self.rectify(v, e, t, tt)
        feats = [emb * r[:, None] for emb, r in zip(self.embeds, ranks)]
        mats = (self.v2e, self.e2t, self.t2tt)
        for layer in self.msg:
            new = []
            for r in range(4):
                m = layer[3 * r](feats[r])
                if r > 0:
                    m = m + mats[r - 1] @ layer[3 * r + 1](feats[r - 1])
                if r < 3:
                    m = m + mats[r].T @ layer[3 * r + 2](feats[r + 1])
                new.append(torch.tanh(m))
            feats = new
        q = self.v2q(feats[0])[None]
        q = F.interpolate(q.transpose(1, 2), size=250, mode="linear").transpose(1, 2)
        mem = torch.cat(feats[1:], dim=0)[None]
        a, _ = self.attn(q, mem, mem)
        h = (q + F.gelu(a)).transpose(1, 2)
        for up in self.ups:
            h = up(h)
        return self.pqmf_synthesis(h)  # [1, 1, ~64000]


def multiscale_stft_loss(x, y):
    loss = 0.0
    for s in (2048, 1024, 512, 256, 128):
        w = torch.hann_window(s)
        sx = torch.stft(x, s, s // 4, window=w, return_complex=True).abs()
        sy = torch.stft(y, s, s // 4, window=w, return_complex=True).abs()
        loss = loss + ((sx - sy) ** 2).mean() / (sx**2).mean().clamp_min(1e-7)
        loss = loss + (torch.log(sx + 1e-7) - torch.log(sy + 1e-7)).abs().mean()
    return loss


def main():
    torch.manual_seed(0)
    model = ProxyModel()
    opt = torch.optim.Adam(model.parameters(), 1e-3)
    x = torch.randn(1, 1, 64000)
    def step():
        y = model(x)
        yw = F.pad(y, (0, 64000 - y.shape[-1]))[:, 0] if y.shape[-1] < 64000 else y[:, 0, :64000]
        loss = multiscale_stft_loss(yw, x[:, 0])
        loss.backward()
        opt.step()
        opt.zero_grad()

    step()  # warmup

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "reference_cpu_clips_per_sec",
                "value": round(iters / dt, 4),
                "unit": "clips/s",
                "note": "torch CPU proxy of the reference graph, batch 1",
            }
        )
    )


if __name__ == "__main__":
    main()
