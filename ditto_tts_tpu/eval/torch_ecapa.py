"""Torch ECAPA-TDNN stand-in with speechbrain's module naming.

Purpose: golden-test oracle for ``models/ecapa.py`` (the reference computes
SIM-o/SIM-r with speechbrain's frozen ``spkrec-ecapa-voxceleb``, ref:
src/Experiments.ipynb cell 14; speechbrain itself is not installed here).
Same recipe as ``eval/torch_bigvgan.py``: reimplement the published
architecture (Desplanques et al. 2020, speechbrain
``lobes/models/ECAPA_TDNN.py`` semantics) with module attribute names
chosen so ``state_dict()`` keys are interchangeable with the real
speechbrain checkpoint — a random-init instance then validates
``import_speechbrain_state_dict``'s naming map and ``ecapa_embed``'s
numerics end-to-end, and the real checkpoint loads the same way when
available.

Naming contract (verified against speechbrain source semantics):
  * sb ``Conv1d`` wrapper holds the real conv at ``.conv`` and pads
    'same' with reflect mode; in the ECAPA lobe it runs skip_transpose
    (channels-first).
  * sb ``BatchNorm1d`` wrapper holds the real BN at ``.norm``.
  * ``ECAPA_TDNN``: ``blocks.0`` initial TDNNBlock; ``blocks.1..3``
    SERes2NetBlock (``tdnn1``/``res2net_block.blocks.i``/``tdnn2``/
    ``se_block.conv{1,2}``); ``mfa`` TDNNBlock; ``asp`` (``tdnn`` +
    ``conv``); ``asp_bn``; ``fc``.

Eval-only; lives off the TPU path (torch CPU).
"""

from __future__ import annotations

import functools


@functools.lru_cache(None)
def _modules():
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class Conv1d(nn.Module):
        """speechbrain Conv1d: inner ``.conv``, reflect 'same' padding."""

        def __init__(self, in_channels, out_channels, kernel_size,
                     dilation=1):
            super().__init__()
            self.conv = nn.Conv1d(in_channels, out_channels, kernel_size,
                                  dilation=dilation)

        def forward(self, x):
            k = self.conv.kernel_size[0]
            d = self.conv.dilation[0]
            eff = d * (k - 1)
            if eff:
                pad = eff // 2
                x = F.pad(x, (pad, eff - pad), mode="reflect")
            return self.conv(x)

    class BatchNorm1d(nn.Module):
        """speechbrain BatchNorm1d: inner ``.norm``."""

        def __init__(self, input_size):
            super().__init__()
            self.norm = nn.BatchNorm1d(input_size)

        def forward(self, x):
            return self.norm(x)

    class TDNNBlock(nn.Module):
        def __init__(self, in_channels, out_channels, kernel_size,
                     dilation=1):
            super().__init__()
            self.conv = Conv1d(in_channels, out_channels, kernel_size,
                               dilation=dilation)
            self.activation = nn.ReLU()
            self.norm = BatchNorm1d(out_channels)

        def forward(self, x):
            return self.norm(self.activation(self.conv(x)))

    class Res2NetBlock(nn.Module):
        def __init__(self, in_channels, out_channels, scale=8,
                     kernel_size=3, dilation=1):
            super().__init__()
            in_channel = in_channels // scale
            hidden = out_channels // scale
            self.blocks = nn.ModuleList(
                [TDNNBlock(in_channel, hidden, kernel_size, dilation)
                 for _ in range(scale - 1)])
            self.scale = scale

        def forward(self, x):
            y = []
            for i, x_i in enumerate(torch.chunk(x, self.scale, dim=1)):
                if i == 0:
                    y_i = x_i
                elif i == 1:
                    y_i = self.blocks[i - 1](x_i)
                else:
                    y_i = self.blocks[i - 1](x_i + y_i)
                y.append(y_i)
            return torch.cat(y, dim=1)

    class SEBlock(nn.Module):
        def __init__(self, in_channels, se_channels, out_channels):
            super().__init__()
            self.conv1 = Conv1d(in_channels, se_channels, 1)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = Conv1d(se_channels, out_channels, 1)
            self.sigmoid = nn.Sigmoid()

        def forward(self, x):
            s = x.mean(dim=2, keepdim=True)
            s = self.relu(self.conv1(s))
            s = self.sigmoid(self.conv2(s))
            return s * x

    class SERes2NetBlock(nn.Module):
        def __init__(self, in_channels, out_channels, res2net_scale=8,
                     se_channels=128, kernel_size=1, dilation=1):
            super().__init__()
            self.tdnn1 = TDNNBlock(in_channels, out_channels, 1)
            self.res2net_block = Res2NetBlock(
                out_channels, out_channels, res2net_scale, kernel_size,
                dilation)
            self.tdnn2 = TDNNBlock(out_channels, out_channels, 1)
            self.se_block = SEBlock(out_channels, se_channels, out_channels)

        def forward(self, x):
            residual = x
            x = self.tdnn1(x)
            x = self.res2net_block(x)
            x = self.tdnn2(x)
            x = self.se_block(x)
            return x + residual

    class AttentiveStatisticsPooling(nn.Module):
        """Global-context ASP (speechbrain semantics, eps=1e-12)."""

        def __init__(self, channels, attention_channels=128):
            super().__init__()
            self.eps = 1e-12
            self.tdnn = TDNNBlock(channels * 3, attention_channels, 1)
            self.tanh = nn.Tanh()
            self.conv = Conv1d(attention_channels, channels, 1)

        def forward(self, x):
            t = x.shape[-1]

            def stats(v, m):
                mean = (m * v).sum(2)
                std = torch.sqrt(
                    (m * (v - mean.unsqueeze(2)).pow(2)).sum(2)
                    .clamp(self.eps))
                return mean, std

            mask = torch.ones(x.shape[0], 1, t, dtype=x.dtype)
            total = mask.sum(dim=2, keepdim=True)
            gmean, gstd = stats(x, mask / total)
            ctx = torch.cat(
                [x, gmean.unsqueeze(2).repeat(1, 1, t),
                 gstd.unsqueeze(2).repeat(1, 1, t)], dim=1)
            attn = self.conv(self.tanh(self.tdnn(ctx)))
            attn = attn.masked_fill(mask == 0, float("-inf"))
            attn = F.softmax(attn, dim=2)
            mean, std = stats(x, attn)
            return torch.cat((mean, std), dim=1).unsqueeze(2)

    class ECAPA_TDNN(nn.Module):
        def __init__(self, input_size=80, lin_neurons=192,
                     channels=(512, 512, 512, 512, 1536),
                     kernel_sizes=(5, 3, 3, 3, 1),
                     dilations=(1, 2, 3, 4, 1),
                     attention_channels=128, res2net_scale=8,
                     se_channels=128):
            super().__init__()
            self.blocks = nn.ModuleList()
            self.blocks.append(
                TDNNBlock(input_size, channels[0], kernel_sizes[0],
                          dilations[0]))
            for i in range(1, len(channels) - 1):
                self.blocks.append(SERes2NetBlock(
                    channels[i - 1], channels[i], res2net_scale,
                    se_channels, kernel_sizes[i], dilations[i]))
            self.mfa = TDNNBlock(channels[-1], channels[-1],
                                 kernel_sizes[-1], dilations[-1])
            self.asp = AttentiveStatisticsPooling(
                channels[-1], attention_channels)
            self.asp_bn = BatchNorm1d(channels[-1] * 2)
            self.fc = Conv1d(channels[-1] * 2, lin_neurons, 1)

        def forward(self, x):
            """x: [B, T, F] fbank features -> [B, lin_neurons]."""
            x = x.transpose(1, 2)
            xl = []
            for layer in self.blocks:
                x = layer(x)
                xl.append(x)
            x = torch.cat(xl[1:], dim=1)     # concat the SERes2Net outputs
            x = self.mfa(x)
            x = self.asp(x)
            x = self.asp_bn(x)
            x = self.fc(x)
            return x.squeeze(-1)

    return locals()


def build_random_ecapa(seed: int = 0):
    """Random-init torch oracle in eval mode (running BN stats randomized
    so the inference-BN path is actually exercised)."""
    import torch

    mods = _modules()
    torch.manual_seed(seed)
    m = mods["ECAPA_TDNN"]()
    with torch.no_grad():
        for mod in m.modules():
            if isinstance(mod, torch.nn.BatchNorm1d):
                mod.running_mean.normal_(0.0, 0.5)
                mod.running_var.uniform_(0.5, 2.0)
    return m.eval()
