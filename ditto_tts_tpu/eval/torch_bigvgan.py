"""Torch BigVGAN v2 generator stand-in for reference e2e parity runs.

The reference loads NVIDIA BigVGAN via ``bigvgan.BigVGAN.from_pretrained``
(ref: src/model/SpeechGenerator.py:47-52) — but the ``bigvgan`` package is
not installed in this environment and the vendor dir
``src/bigvgan_v2_24khz_100band_256x/`` is empty in the snapshot. This module
provides a torch implementation of the SAME generator architecture (NVIDIA
BigVGAN v2: conv_pre, ConvTranspose upsample stages, AMPBlock1 residual
stacks with anti-aliased SnakeBeta activations, activation_post, bias-free
conv_post, clamp) with NVIDIA's exact module naming, so
``models.vocoder.import_bigvgan_state_dict`` ingests its ``state_dict()``
unchanged and ``eval.reference_harness`` can stub the ``bigvgan`` import.

The kaiser-sinc anti-aliasing filters are taken from
``ops.resample.kaiser_sinc_filter1d`` (the same constants both sides use),
and the resampling pad/crop arithmetic mirrors NVIDIA's alias-free-torch
UpSample1d/DownSample1d modules.

Also provides ``get_mel_spectrogram(wav, h)`` with BigVGAN meldataset
semantics (reflect pad, center=False periodic-Hann STFT,
sqrt(|.|^2 + 1e-9), slaney mel filterbank, log-clamp compression), invoked
by the reference at src/model/SpeechGenerator.py:125.

Everything here is torch-only and lazily imported; nothing in the TPU
compute path depends on this module.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

from ..core.config import VocoderConfig
from ..ops.mel import mel_filterbank
from ..ops.resample import kaiser_sinc_filter1d

# configuration the stubbed ``BigVGAN.from_pretrained`` builds; the harness
# overrides this before constructing the reference SpeechGenerator.
FROM_PRETRAINED_CONFIG: VocoderConfig = VocoderConfig()
FROM_PRETRAINED_SEED: int = 0x5EED


class AttrDict(dict):
    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e


def _torch():
    import torch
    return torch


def make_h(cfg: VocoderConfig) -> AttrDict:
    return AttrDict(
        num_mels=cfg.num_mels, n_fft=cfg.n_fft, hop_size=cfg.hop_size,
        win_size=cfg.win_size, sampling_rate=cfg.sampling_rate,
        fmin=cfg.fmin, fmax=cfg.fmax)


# ---------------------------------------------------------------------------
# mel analysis (BigVGAN meldataset.get_mel_spectrogram semantics)
# ---------------------------------------------------------------------------

_mel_basis_cache = {}
_window_cache = {}


def get_mel_spectrogram(wav, h):
    """wav: [B, T] torch tensor -> log-mel [B, num_mels, frames]."""
    torch = _torch()
    key = (h.sampling_rate, h.n_fft, h.num_mels, h.fmin, h.fmax)
    if key not in _mel_basis_cache:
        _mel_basis_cache[key] = torch.from_numpy(
            mel_filterbank(h.sampling_rate, h.n_fft, h.num_mels,
                           float(h.fmin),
                           None if h.fmax is None else float(h.fmax)))
    if h.win_size not in _window_cache:
        _window_cache[h.win_size] = torch.hann_window(h.win_size)
    basis = _mel_basis_cache[key].to(wav.dtype)
    window = _window_cache[h.win_size].to(wav.dtype)

    pad = (h.n_fft - h.hop_size) // 2
    y = torch.nn.functional.pad(
        wav.unsqueeze(1), (pad, pad), mode="reflect").squeeze(1)
    spec = torch.stft(y, h.n_fft, hop_length=h.hop_size,
                      win_length=h.win_size, window=window, center=False,
                      pad_mode="reflect", normalized=False, onesided=True,
                      return_complex=True)
    spec = torch.sqrt(spec.real ** 2 + spec.imag ** 2 + 1e-9)
    mel = torch.matmul(basis, spec)
    return torch.log(torch.clamp(mel, min=1e-5))


# ---------------------------------------------------------------------------
# alias-free resampling (NVIDIA alias_free_activation/torch/resample.py)
# ---------------------------------------------------------------------------

def _filt(cutoff, half_width, kernel_size):
    torch = _torch()
    f = kaiser_sinc_filter1d(cutoff, half_width, kernel_size)
    return torch.from_numpy(np.asarray(f)).view(1, 1, kernel_size)


def _modules():
    torch = _torch()
    nn = torch.nn
    F = torch.nn.functional

    class UpSample1d(nn.Module):
        def __init__(self, ratio=2):
            super().__init__()
            self.ratio = ratio
            self.kernel_size = int(6 * ratio // 2) * 2
            self.stride = ratio
            self.pad = self.kernel_size // ratio - 1
            self.pad_left = self.pad * self.stride \
                + (self.kernel_size - self.stride) // 2
            self.pad_right = self.pad * self.stride \
                + (self.kernel_size - self.stride + 1) // 2
            self.register_buffer(
                "filter",
                _filt(0.5 / ratio, 0.6 / ratio, self.kernel_size))

        def forward(self, x):
            c = x.shape[1]
            x = F.pad(x, (self.pad, self.pad), mode="replicate")
            x = self.ratio * F.conv_transpose1d(
                x, self.filter.expand(c, -1, -1).to(x.dtype),
                stride=self.stride, groups=c)
            return x[..., self.pad_left:-self.pad_right]

    class DownSample1d(nn.Module):
        def __init__(self, ratio=2):
            super().__init__()
            self.stride = ratio
            self.kernel_size = int(6 * ratio // 2) * 2
            self.pad_left = self.kernel_size // 2 \
                - int(self.kernel_size % 2 == 0)
            self.pad_right = self.kernel_size // 2
            self.register_buffer(
                "filter",
                _filt(0.5 / ratio, 0.6 / ratio, self.kernel_size))

        def forward(self, x):
            c = x.shape[1]
            x = F.pad(x, (self.pad_left, self.pad_right), mode="replicate")
            return F.conv1d(x, self.filter.expand(c, -1, -1).to(x.dtype),
                            stride=self.stride, groups=c)

    class SnakeBeta(nn.Module):
        def __init__(self, channels, logscale=True):
            super().__init__()
            self.logscale = logscale
            self.alpha = nn.Parameter(torch.zeros(channels))
            self.beta = nn.Parameter(torch.zeros(channels))

        def forward(self, x):
            a = self.alpha.exp() if self.logscale else self.alpha
            b = self.beta.exp() if self.logscale else self.beta
            a = a.view(1, -1, 1)
            b = b.view(1, -1, 1)
            return x + (1.0 / (b + 1e-9)) * torch.sin(a * x) ** 2

    class Activation1d(nn.Module):
        def __init__(self, act):
            super().__init__()
            self.act = act
            self.upsample = UpSample1d(2)
            self.downsample = DownSample1d(2)

        def forward(self, x):
            return self.downsample(self.act(self.upsample(x)))

    class AMPBlock1(nn.Module):
        def __init__(self, channels, kernel_size, dilations, logscale):
            super().__init__()
            def pad(d):
                return (kernel_size * d - d) // 2
            self.dilations = dilations
            self.convs1 = nn.ModuleList([
                nn.Conv1d(channels, channels, kernel_size, dilation=d,
                          padding=pad(d)) for d in dilations])
            self.convs2 = nn.ModuleList([
                nn.Conv1d(channels, channels, kernel_size, padding=pad(1))
                for _ in dilations])
            self.activations = nn.ModuleList([
                Activation1d(SnakeBeta(channels, logscale))
                for _ in range(2 * len(dilations))])

        def forward(self, x):
            for i in range(len(self.dilations)):
                xt = self.activations[2 * i](x)
                xt = self.convs1[i](xt)
                xt = self.activations[2 * i + 1](xt)
                xt = self.convs2[i](xt)
                x = x + xt
            return x

    class BigVGAN(nn.Module):
        """NVIDIA BigVGAN v2 generator (weight-norm already removed)."""

        def __init__(self, cfg: VocoderConfig):
            super().__init__()
            self.h = make_h(cfg)
            self.num_kernels = len(cfg.resblock_kernel_sizes)
            ch = cfg.upsample_initial_channel
            self.conv_pre = nn.Conv1d(cfg.num_mels, ch, 7, padding=3)
            self.ups = nn.ModuleList()
            self.resblocks = nn.ModuleList()
            for i, (rate, k) in enumerate(zip(cfg.upsample_rates,
                                              cfg.upsample_kernel_sizes)):
                self.ups.append(nn.ModuleList([
                    nn.ConvTranspose1d(ch, ch // 2, k, stride=rate,
                                       padding=(k - rate) // 2)]))
                ch //= 2
                for rk, dils in zip(cfg.resblock_kernel_sizes,
                                    cfg.resblock_dilation_sizes):
                    self.resblocks.append(
                        AMPBlock1(ch, rk, dils, cfg.snake_logscale))
            self.activation_post = Activation1d(
                SnakeBeta(ch, cfg.snake_logscale))
            self.conv_post = nn.Conv1d(ch, 1, 7, padding=3, bias=False)

        def forward(self, mel):
            x = self.conv_pre(mel)
            for i in range(len(self.ups)):
                for up in self.ups[i]:
                    x = up(x)
                xs = None
                for j in range(self.num_kernels):
                    out = self.resblocks[i * self.num_kernels + j](x)
                    xs = out if xs is None else xs + out
                x = xs / self.num_kernels
            x = self.activation_post(x)
            x = self.conv_post(x)
            return torch.clamp(x, -1.0, 1.0)

        def remove_weight_norm(self):  # already norm-free
            return self

        @classmethod
        def from_pretrained(cls, name, use_cuda_kernel=False, **kw):
            """Seeded random-init stand-in for the HF download."""
            torch.manual_seed(FROM_PRETRAINED_SEED)
            m = cls(FROM_PRETRAINED_CONFIG)
            with torch.no_grad():
                # non-zero snake params so the activation actually bends
                for mod in m.modules():
                    if isinstance(mod, SnakeBeta):
                        mod.alpha.normal_(0.0, 0.2)
                        mod.beta.normal_(0.0, 0.2)
            return m.eval()

    return AttrDict(BigVGAN=BigVGAN, SnakeBeta=SnakeBeta,
                    Activation1d=Activation1d, AMPBlock1=AMPBlock1,
                    UpSample1d=UpSample1d, DownSample1d=DownSample1d)


def build_bigvgan(cfg: Optional[VocoderConfig] = None, seed: int = 0x5EED):
    """Construct a seeded random-init torch BigVGAN for the given config."""
    global FROM_PRETRAINED_CONFIG, FROM_PRETRAINED_SEED
    if cfg is not None:
        FROM_PRETRAINED_CONFIG = cfg
    FROM_PRETRAINED_SEED = seed
    return _modules().BigVGAN.from_pretrained("nvidia/bigvgan_v2_stub")
