"""BigVGAN v2 generator in JAX (24 kHz / 100-band / 256x geometry).

Behavioral spec: NVIDIA BigVGAN's generator as used frozen by the reference
(ref: src/model/SpeechGenerator.py:47-52 — ``use_cuda_kernel=False``,
``remove_weight_norm()``): mel [B, 100, T] -> waveform [B, 1, 256*T].

  conv_pre (k=7) -> 6 stages of [ConvTranspose upsample (4,4,2,2,2,2),
  mean of 3 AMP residual blocks (k = 3,7,11; dilations 1,3,5)] ->
  anti-aliased SnakeBeta -> conv_post (k=7, no bias) -> clamp [-1, 1]
  (v2 uses no final tanh).

Every activation is the anti-aliased SnakeBeta (2x kaiser-sinc up, snake,
2x down) from ops/snake.py; set ``fused=True`` to route it through the
fused Pallas kernel. Weight-norm from checkpoints is folded at import.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import VocoderConfig
from ..nn.conv import (conv1d, conv1d_nlc, conv1d_nlc_gemm,
                       conv_transpose1d_poly, pad1d)
from ..ops.snake import (anti_aliased_activation,
                         polyphase_anti_aliased_activation,
                         polyphase_anti_aliased_activation_gemm,
                         snake, snake_beta)


def _get_padding(k: int, d: int) -> int:
    return (k * d - d) // 2


def _act(x, act_params, cfg: VocoderConfig, impl: str, fast: bool = False):
    if cfg.activation == "snakebeta":
        def fn(v):
            return snake_beta(v, act_params["alpha"], act_params["beta"],
                              logscale=cfg.snake_logscale, fast=fast)
    else:
        def fn(v):
            return snake(v, act_params["alpha"],
                         logscale=cfg.snake_logscale, fast=fast)
    if not cfg.use_anti_aliasing:
        return fn(x)
    if impl == "fused_pallas":
        from ..ops.snake_pallas import fused_snake_pallas
        return fused_snake_pallas(
            x, act_params["alpha"], act_params.get("beta"),
            logscale=cfg.snake_logscale)
    if impl == "polyphase":
        return polyphase_anti_aliased_activation(x, fn)
    return anti_aliased_activation(x, fn)


def _conv_same(p, x, *, dilation=1, cdt=None, conv_fn=None):
    k = p["weight"].shape[-1]
    pad = _get_padding(k, dilation)
    x = pad1d(x, (pad, pad))
    return (conv_fn or conv1d)(x, p["weight"], p.get("bias"),
                               dilation=dilation, compute_dtype=cdt)


def _amp_block(p, cfg: VocoderConfig, x, dilations, impl: str, cdt,
               conv_fn=None, fast: bool = False):
    """AMPBlock1: [act, dilated conv, act, conv] x len(dilations), residual."""
    n = len(p["convs1"])
    for i in range(n):
        xt = _act(x, p["act1"][i], cfg, impl, fast=fast)
        xt = _conv_same(p["convs1"][i], xt, dilation=dilations[i], cdt=cdt,
                        conv_fn=conv_fn)
        xt = _act(xt, p["act2"][i], cfg, impl, fast=fast)
        xt = _conv_same(p["convs2"][i], xt, cdt=cdt, conv_fn=conv_fn)
        x = x + xt
    return x


def _resolve_ncl_conv_fn():
    """Time-minor VMEM-accumulator conv for the hybrid narrow stages
    (slope microbench, v5e, k=7 d=3: 0.43 vs 1.67 ms at C=48, 0.29 vs
    1.47 at C=24 against the channels-last gemm form — the [B, T, C]
    HBM layout pads the 128-lane minor dim 2.7-5.3x at these widths).
    None off-TPU (callers fall back to lax.conv)."""
    interp = _pallas_mode()
    if interp is None:
        return None
    from ..ops.conv_pallas import conv1d_ncl_pallas

    def f(x, w, b=None, *, dilation=1, compute_dtype=None):
        if w.shape[0] < 8:          # conv_post (O=1): sublane-starved
            return conv1d(x, w, b, dilation=dilation,
                          compute_dtype=compute_dtype)
        # windowed=True: single [O, K*C] x [K*C, bt] contraction
        # (r5 slope probe: 0.844 -> 0.327 ms at C=24/k=11/bf16,
        # 0.278 -> 0.145 at C=48 — per-tap dots pad their 24/48-deep
        # contraction to the 128-row MXU tile)
        return conv1d_ncl_pallas(x, w, b, dilation=dilation,
                                 compute_dtype=compute_dtype,
                                 interpret=interp, windowed=True)
    return f


def bigvgan_forward(params, cfg: VocoderConfig, mel, *,
                    fused: bool = False, aa_impl: Optional[str] = None,
                    layout: Optional[str] = None):
    """mel: [B, num_mels, T] -> waveform [B, 1, T * prod(rates)].

    ``aa_impl`` selects the anti-aliased activation implementation
    ("fused_conv" | "polyphase" | "polyphase_gemm" | "composed" |
    "fused_pallas"); defaults to ``cfg.aa_impl`` (see the VocoderConfig
    docstring for the dispatch semantics). ``fused=True`` is a legacy
    alias for "fused_pallas".
    ``layout`` ("ncl" | "nlc", default ``cfg.layout``) selects the carry
    layout: "nlc" keeps the signal channels-last throughout — the layout
    TPU conv lowering targets natively (channels = GEMM contraction axis),
    avoiding per-conv layout transposes.

    Conv operands are cast to ``cfg.compute_dtype`` for the MXU (fp32
    accumulation regardless); the signal is carried between ops in
    ``cfg.carry_dtype``. The dilated convs are compute-bound (bf16 runs
    them at the MXU's native rate) while the anti-aliased activation
    chains are HBM-bandwidth-bound (bf16 halves their traffic).
    """
    impl = aa_impl or ("fused_pallas" if fused else cfg.aa_impl)
    if (layout or cfg.layout) == "nlc":
        return _bigvgan_forward_nlc(params, cfg, mel, impl)
    if impl == "fused_conv":
        impl = "polyphase"      # fusion exists on the nlc fast path only
    # Always pass an explicit compute dtype: the signal is carried in
    # cfg.carry_dtype while weights stay fp32, so the conv primitives must
    # cast BOTH operands (a no-op cast when dtypes already match).
    cdt = jnp.dtype(cfg.compute_dtype)
    x = mel.astype(cfg.carry_dtype)
    x = _conv_same(params["conv_pre"], x, cdt=cdt)
    num_kernels = len(cfg.resblock_kernel_sizes)
    for i, rate in enumerate(cfg.upsample_rates):
        k = cfg.upsample_kernel_sizes[i]
        up = params["ups"][i]
        y = conv_transpose1d_poly(x, up["weight"], up.get("bias"),
                                  stride=rate, compute_dtype=cdt,
                                  layout="ncl")
        # torch ConvTranspose1d padding=(k-rate)//2 trims both sides
        trim = (k - rate) // 2
        if trim:
            y = y[..., trim:-trim]
        acc = None
        for j, rb in enumerate(params["resblocks"][i]):
            out = _amp_block(rb, cfg, y, cfg.resblock_dilation_sizes[j],
                             impl, cdt)
            acc = out if acc is None else acc + out
        x = acc / num_kernels
    x = _act(x, params["act_post"], cfg, impl)
    x = _conv_same(params["conv_post"], x, cdt=cdt)
    return jnp.clip(x.astype(jnp.float32), -1.0, 1.0)


# ---------------------------------------------------------------------------
# channels-last (NLC) forward path
# ---------------------------------------------------------------------------

def _act_nlc(x, act_params, cfg: VocoderConfig, impl: str):
    """x: [B, T, C]."""
    fast = impl == "fused_conv"
    if fast:
        # standalone activations (act_post, widths outside the fused
        # kernel's dispatch) fall back to the slice-form polyphase with
        # the production fast sin^2 (the fused kernels use the same)
        impl = "polyphase"
    if cfg.activation == "snakebeta":
        def fn(v):
            return snake_beta(v, act_params["alpha"], act_params["beta"],
                              logscale=cfg.snake_logscale, channel_axis=-1,
                              fast=fast)
    else:
        def fn(v):
            return snake(v, act_params["alpha"],
                         logscale=cfg.snake_logscale, channel_axis=-1,
                         fast=fast)
    if not cfg.use_anti_aliasing:
        return fn(x)
    if impl == "fused_pallas":
        # narrow stages pad channels to a 128 lane tile — past ~4x padding
        # waste the XLA polyphase path wins, so dispatch on width
        interp = _pallas_mode()
        if x.shape[-1] >= 96 and interp is not None:
            from ..ops.snake_pallas_nlc import fused_snake_nlc
            beta = (act_params["beta"] if cfg.activation == "snakebeta"
                    else None)
            return fused_snake_nlc(x, act_params["alpha"], beta,
                                   logscale=cfg.snake_logscale,
                                   interpret=interp)
        impl = "polyphase"
    if impl == "polyphase_gemm":
        # the GEMM variant runs its interior in [B, C, T] (time-minor)
        if cfg.activation == "snakebeta":
            def fn_cm(v):
                return snake_beta(v, act_params["alpha"],
                                  act_params["beta"],
                                  logscale=cfg.snake_logscale,
                                  channel_axis=1)
        else:
            def fn_cm(v):
                return snake(v, act_params["alpha"],
                             logscale=cfg.snake_logscale, channel_axis=1)
        return polyphase_anti_aliased_activation_gemm(x, fn_cm)
    if impl != "polyphase":
        raise NotImplementedError(
            "nlc layout supports aa_impl in ('polyphase', 'polyphase_gemm',"
            f" 'fused_pallas') only (got {impl!r}); use layout='ncl' for "
            "the oracle paths")
    return polyphase_anti_aliased_activation(x, fn, time_axis=1)


def _pad_time(x, pad):
    return jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))


def _pallas_mode():
    """None = no pallas off-TPU; else the interpret flag to pass.
    (ops.conv_pallas.FORCE_INTERPRET is the CPU-test override.)"""
    from ..ops.conv_pallas import pallas_mode
    return pallas_mode()


def _resolve_conv_fn(cfg: VocoderConfig):
    """conv_impl -> the channels-last VALID/stride-1 conv lowering.

    "pallas" is an empirical per-width dispatch (slope microbench,
    scripts/profile_conv.py, v5e): the VMEM-accumulator kernel wins
     2-4.9x at C_in 96-384, while XLA's tap-sum GEMM is already near
    matmul peak at C=768 (175 TF/s) and the 24/48-wide late stages are
    bound by the 128-lane-padded HBM layout either way."""
    if cfg.conv_impl == "pallas":
        interp = _pallas_mode()
        if interp is None:
            return conv1d_nlc_gemm
        from ..ops.conv_pallas import conv1d_nlc_pallas

        def dispatch(x, w, b=None, *, dilation=1, compute_dtype=None):
            if 96 <= w.shape[1] <= 384:
                return conv1d_nlc_pallas(x, w, b, dilation=dilation,
                                         compute_dtype=compute_dtype,
                                         interpret=interp)
            return conv1d_nlc_gemm(x, w, b, dilation=dilation,
                                   compute_dtype=compute_dtype)
        return dispatch
    return conv1d_nlc_gemm if cfg.conv_impl == "gemm" else conv1d_nlc


def _conv_same_nlc(p, x, *, dilation=1, cdt=None, conv_fn=conv1d_nlc_gemm):
    k = p["weight"].shape[-1]
    if p["weight"].shape[0] < 8:
        conv_fn = conv1d_nlc_gemm   # pallas needs >=8 output lanes
    return conv_fn(_pad_time(x, _get_padding(k, dilation)), p["weight"],
                   p.get("bias"), dilation=dilation, compute_dtype=cdt)


def _amp_block_nlc(p, cfg, x, dilations, impl, cdt, conv_fn):
    # aa_impl="fused_conv": each act->conv pair runs as ONE Pallas kernel
    # (ops/act_conv_pallas.py) at the widths where the VMEM conv kernel
    # already wins (96-384) — x is read once per pair instead of the
    # activation costing its own HBM round trip plus XLA's materialized
    # FIR tap intermediates.  (An r5 probe routed C=384 to the SEPARATE
    # act kernel + conv kernel — 1.32 + 0.41 vs 2.27 ms/pair in
    # isolation — but the full bench measured it 12 ms SLOWER e2e, so
    # the fused dispatch stays through 384.)
    interp = _pallas_mode()
    fuse = (impl == "fused_conv" and cfg.use_anti_aliasing
            and 96 <= x.shape[-1] <= 384 and interp is not None)
    if fuse:
        from ..ops.act_conv_pallas import aa_snake_conv1d
        beta = cfg.activation == "snakebeta"

        def pair(v, act, conv, dil):
            return aa_snake_conv1d(
                v, act["alpha"], act.get("beta") if beta else None,
                conv["weight"], conv.get("bias"), dilation=dil,
                logscale=cfg.snake_logscale, compute_dtype=cdt,
                interpret=interp)

    for i in range(len(p["convs1"])):
        if fuse:
            xt = pair(x, p["act1"][i], p["convs1"][i], dilations[i])
            xt = pair(xt, p["act2"][i], p["convs2"][i], 1)
        else:
            xt = _act_nlc(x, p["act1"][i], cfg, impl)
            xt = _conv_same_nlc(p["convs1"][i], xt, dilation=dilations[i],
                                cdt=cdt, conv_fn=conv_fn)
            xt = _act_nlc(xt, p["act2"][i], cfg, impl)
            xt = _conv_same_nlc(p["convs2"][i], xt, cdt=cdt,
                                conv_fn=conv_fn)
        x = x + xt
    return x


def _amp_block_ncl(p, cfg, x, dilations, impl, cdt, conv_fn):
    """Time-minor AMP block. ``impl="fused_ncl"`` routes each act->conv
    pair through ONE Pallas kernel (ops/act_conv_pallas.py NCL twin) with
    the residual folded into the second pair's epilogue.  Measured on
    v5e (r5): the fused NCL kernel runs AT PARITY with the unfused path
    (17.3 vs 15.2 ms per resblock at C=24) — the narrow stages are bound
    by lane-axis FIR shifts either way, not by the activation's HBM
    round trip — so the production default ("fused_conv") stays on the
    unfused polyphase act + time-minor conv kernel here."""
    interp = _pallas_mode()
    fuse = (impl == "fused_ncl" and cfg.use_anti_aliasing
            and interp is not None)
    if not fuse:
        fast = impl == "fused_conv"
        if fast or impl == "fused_ncl":
            impl = "polyphase"
        return _amp_block(p, cfg, x, dilations, impl, cdt, conv_fn=conv_fn,
                          fast=fast)
    from ..ops.act_conv_pallas import aa_snake_conv1d_ncl
    beta = cfg.activation == "snakebeta"

    def pair(v, act, conv, dil, residual=None):
        return aa_snake_conv1d_ncl(
            v, act["alpha"], act.get("beta") if beta else None,
            conv["weight"], conv.get("bias"), dilation=dil,
            logscale=cfg.snake_logscale, compute_dtype=cdt,
            interpret=interp, residual=residual)

    for i in range(len(p["convs1"])):
        xt = pair(x, p["act1"][i], p["convs1"][i], dilations[i])
        x = pair(xt, p["act2"][i], p["convs2"][i], 1, residual=x)
    return x


def _bigvgan_forward_nlc(params, cfg: VocoderConfig, mel, impl: str):
    """Same math as the NCL body, carried [B, T, C] through the wide
    stages (one transpose in).  With conv_impl="pallas" the carry flips
    to time-minor [B, C, T] once the width drops below 96: at C=24/48
    the channels-last HBM layout pads the 128-lane minor dim 2.7-5.3x,
    so every op pays phantom bandwidth; the NCL carry is dense and the
    narrow convs run the time-minor VMEM-accumulator kernel."""
    cdt = jnp.dtype(cfg.compute_dtype)
    conv_fn = _resolve_conv_fn(cfg)
    hybrid = cfg.conv_impl == "pallas"
    ncl_conv = _resolve_ncl_conv_fn() if hybrid else None
    x = mel.astype(cfg.carry_dtype).transpose(0, 2, 1)     # [B, T, C]
    x = _conv_same_nlc(params["conv_pre"], x, cdt=cdt, conv_fn=conv_fn)
    num_kernels = len(cfg.resblock_kernel_sizes)
    layout = "nlc"
    for i, rate in enumerate(cfg.upsample_rates):
        k = cfg.upsample_kernel_sizes[i]
        up = params["ups"][i]
        if (hybrid and layout == "nlc"
                and up["weight"].shape[1] < 96):   # [I, O, K] convtr
            x = x.transpose(0, 2, 1)               # -> [B, C, T]
            layout = "ncl"
        if layout == "nlc":
            y = conv_transpose1d_poly(x, up["weight"], up.get("bias"),
                                      stride=rate, compute_dtype=cdt,
                                      layout="nlc", conv_fn=conv_fn)
            trim = (k - rate) // 2
            if trim:
                y = y[:, trim:-trim]
            acc = None
            for j, rb in enumerate(params["resblocks"][i]):
                out = _amp_block_nlc(rb, cfg, y,
                                     cfg.resblock_dilation_sizes[j],
                                     impl, cdt, conv_fn)
                acc = out if acc is None else acc + out
        else:
            y = conv_transpose1d_poly(x, up["weight"], up.get("bias"),
                                      stride=rate, compute_dtype=cdt,
                                      layout="ncl", conv_fn=ncl_conv)
            trim = (k - rate) // 2
            if trim:
                y = y[..., trim:-trim]
            acc = None
            for j, rb in enumerate(params["resblocks"][i]):
                out = _amp_block_ncl(rb, cfg, y,
                                     cfg.resblock_dilation_sizes[j],
                                     impl, cdt, ncl_conv)
                acc = out if acc is None else acc + out
        x = acc / num_kernels
    if layout == "ncl":
        x = _act(x, params["act_post"], cfg, "polyphase",
                 fast=impl == "fused_conv")
        x = _conv_same(params["conv_post"], x, cdt=cdt, conv_fn=ncl_conv)
        return jnp.clip(x.astype(jnp.float32), -1.0, 1.0)  # already [B,1,T]
    x = _act_nlc(x, params["act_post"], cfg, impl)
    x = _conv_same_nlc(params["conv_post"], x, cdt=cdt, conv_fn=conv_fn)
    return jnp.clip(x.astype(jnp.float32), -1.0, 1.0).transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# init + BigVGAN checkpoint import
# ---------------------------------------------------------------------------

def init_bigvgan(key, cfg: VocoderConfig, dtype=jnp.float32) -> Dict:
    from ..codec.seanet import _conv_init, _convtr_init

    keys = jax.random.split(key, 256)
    ki = iter(keys)
    ch = cfg.upsample_initial_channel
    params: Dict = {"conv_pre": _conv_init(next(ki), ch, cfg.num_mels, 7,
                                           dtype)}
    ups, resblocks = [], []
    for i, rate in enumerate(cfg.upsample_rates):
        k = cfg.upsample_kernel_sizes[i]
        ups.append(_convtr_init(next(ki), ch, ch // 2, k, dtype))
        ch //= 2
        level = []
        for rk, dils in zip(cfg.resblock_kernel_sizes,
                            cfg.resblock_dilation_sizes):
            blk = {
                "convs1": [_conv_init(next(ki), ch, ch, rk, dtype)
                           for _ in dils],
                "convs2": [_conv_init(next(ki), ch, ch, rk, dtype)
                           for _ in dils],
                "act1": [{"alpha": jnp.zeros((ch,), dtype),
                          "beta": jnp.zeros((ch,), dtype)} for _ in dils],
                "act2": [{"alpha": jnp.zeros((ch,), dtype),
                          "beta": jnp.zeros((ch,), dtype)} for _ in dils],
            }
            level.append(blk)
        resblocks.append(level)
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["act_post"] = {"alpha": jnp.zeros((ch,), dtype),
                          "beta": jnp.zeros((ch,), dtype)}
    conv_post = _conv_init(next(ki), 1, ch, 7, dtype)
    del conv_post["bias"]  # v2: use_bias_at_final=False
    params["conv_post"] = conv_post
    return params


def import_bigvgan_state_dict(sd: Dict[str, np.ndarray],
                              cfg: VocoderConfig) -> Dict:
    """Map a BigVGAN generator state_dict (weight-norm folded) to params."""
    from ..codec.encodec import _fold_weight_norm

    def conv(prefix, bias=True):
        out = {"weight": jnp.asarray(_fold_weight_norm(sd, prefix))}
        if bias and f"{prefix}.bias" in sd:
            out["bias"] = jnp.asarray(np.asarray(sd[f"{prefix}.bias"]))
        return out

    def act(prefix):
        out = {"alpha": jnp.asarray(
            np.asarray(sd[f"{prefix}.alpha"]).reshape(-1))}
        if f"{prefix}.beta" in sd:
            out["beta"] = jnp.asarray(
                np.asarray(sd[f"{prefix}.beta"]).reshape(-1))
        return out

    nk = len(cfg.resblock_kernel_sizes)
    params: Dict = {"conv_pre": conv("conv_pre")}
    ups, resblocks = [], []
    for i in range(len(cfg.upsample_rates)):
        ups.append(conv(f"ups.{i}.0"))
        level = []
        for j, dils in enumerate(cfg.resblock_dilation_sizes):
            b = f"resblocks.{i * nk + j}"
            nd = len(dils)
            level.append({
                "convs1": [conv(f"{b}.convs1.{m}") for m in range(nd)],
                "convs2": [conv(f"{b}.convs2.{m}") for m in range(nd)],
                "act1": [act(f"{b}.activations.{2 * m}.act")
                         for m in range(nd)],
                "act2": [act(f"{b}.activations.{2 * m + 1}.act")
                         for m in range(nd)],
            })
        resblocks.append(level)
    params["ups"] = ups
    params["resblocks"] = resblocks
    params["act_post"] = act("activation_post.act")
    params["conv_post"] = conv("conv_post")
    return params
