"""DiT diffusion transformer (functional, TPU-first).

Re-design of the reference DiT stack (ref: src/components/DiT.py and
src/model/DiTTO.py) with explicit param pytrees:

  * GlobalAdaLN — time+text conditioned scale/shift applied once before the
    block stack: ``scale = 1 + time_scale + text_scale``, mean-pooled text,
    non-affine LN (ref: DiT.py:8-40).
  * DiTBlock — self-attention with RoPE, cross-attention to text, gated MLP
    (GELU ⊙ sigmoid gate) (ref: DiT.py:75-157).
  * DiTTO — learned timestep embedding + SiLU MLP, shared GlobalAdaLN, N
    blocks, long skip via proj_in/proj_out (ref: DiTTO.py:7-94).

Reference-compat flags (SURVEY §2.10):
  * quirk #2 — the reference never applies the self-attention output
    projection (DiT.py:137-139). ``ref_compat=True`` reproduces that;
    the default applies ``out_proj`` as a correct transformer would.
    Params for out_proj exist in both modes so checkpoints are portable.
  * quirk #3 — per-block time embedding is accepted and ignored by the
    reference block; here time conditioning enters only via GlobalAdaLN in
    both modes (matching actual reference behavior).

Attention layout is [B, H, S, D] feeding the Pallas TPU kernel in
``ops.attention``; all matmuls accumulate fp32 on the MXU.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.config import DiTConfig
from ..nn.core import (Embedding, LayerNorm, Linear, dense, embed, layer_norm,
                       normal, xavier_uniform)
from ..ops.attention import attention
from ..ops.rope import apply_rope, rope_tables


# ---------------------------------------------------------------------------
# param init
# ---------------------------------------------------------------------------

def _mha_init(key, embed_dim: int, dtype=jnp.float32):
    """torch.nn.MultiheadAttention layout: packed in_proj + out_proj.

    torch initializes in_proj_weight with xavier_uniform, biases to 0, and
    out_proj as a Linear (kaiming) — we mirror that so random-init scale
    statistics match the reference.
    """
    k1, k2 = jax.random.split(key)
    w_in = xavier_uniform(k1, (3 * embed_dim, embed_dim),
                          embed_dim, 3 * embed_dim, dtype)
    out = Linear(embed_dim, embed_dim).init(k2, dtype)
    return {
        "in_proj_weight": w_in,
        "in_proj_bias": jnp.zeros((3 * embed_dim,), dtype),
        "out_proj": out,
    }


def init_global_adaln(key, cfg: DiTConfig, dtype=jnp.float32):
    k1, k2 = jax.random.split(key)
    h = cfg.hidden_dim
    return {
        "time_mlp": Linear(cfg.time_dim, 2 * h).init(k1, dtype),
        "text_mlp": Linear(cfg.text_dim, 2 * h).init(k2, dtype),
    }


def init_dit_block(key, cfg: DiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 8)
    h = cfg.hidden_dim
    return {
        "norm1": LayerNorm(h).init(ks[0], dtype),
        "attn": _mha_init(ks[1], h, dtype),
        "norm2": LayerNorm(h).init(ks[2], dtype),
        "cross_attn": _mha_init(ks[3], h, dtype),
        "norm3": LayerNorm(h).init(ks[4], dtype),
        "mlp_fc1": Linear(h, cfg.mlp_ratio * h).init(ks[5], dtype),
        "gate": Linear(h, cfg.mlp_ratio * h).init(ks[6], dtype),
        "mlp_fc2": Linear(cfg.mlp_ratio * h, h).init(ks[7], dtype),
    }


def init_ditto(key, cfg: DiTConfig, dtype=jnp.float32):
    ks = jax.random.split(key, 6 + cfg.num_layers)
    h = cfg.hidden_dim
    params = {
        "t_embedding": Embedding(cfg.diffusion_steps, cfg.time_dim).init(
            ks[0], dtype),
        "time_embed": {
            "fc1": Linear(cfg.time_dim, cfg.time_dim).init(ks[1], dtype),
            "fc2": Linear(cfg.time_dim, cfg.time_dim).init(ks[2], dtype),
        },
        "ada_ln": init_global_adaln(ks[3], cfg, dtype),
        "proj_in": Linear(h, h).init(ks[4], dtype),
        "proj_out": Linear(h, h).init(ks[5], dtype),
        "blocks": [init_dit_block(ks[6 + i], cfg, dtype)
                   for i in range(cfg.num_layers)],
    }
    return params


def import_reference_state_dict(sd, cfg: DiTConfig):
    """Map a reference ``DiTTO.state_dict()`` to the param pytree.

    Reference module naming (ref: src/model/DiTTO.py:37-57, src/components/
    DiT.py:8-98): ``t_embedding``, ``time_embed.{0,2}`` (Sequential),
    ``ada_ln.{time,text}_mlp.1`` (Sequential(SiLU, Linear)), ``blocks.{i}``
    with ``norm{1,2,3}``, ``attn``/``cross_attn`` (torch MultiheadAttention
    packed in_proj + out_proj), ``mlp_fc1``/``gate``/``mlp_fc2``, and
    ``proj_in``/``proj_out``. Buffers (``alphas_cumprod``, ``rotary.inv_freq``)
    and the frozen ``nac.*`` subtree are ignored. Works on both full DiTTO
    checkpoints and bare state dicts.
    """
    import numpy as np

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]))

    def lin(prefix):
        out = {"weight": arr(f"{prefix}.weight")}
        if f"{prefix}.bias" in sd:
            out["bias"] = arr(f"{prefix}.bias")
        return out

    def mha(prefix):
        return {
            "in_proj_weight": arr(f"{prefix}.in_proj_weight"),
            "in_proj_bias": arr(f"{prefix}.in_proj_bias"),
            "out_proj": lin(f"{prefix}.out_proj"),
        }

    blocks = []
    for i in range(cfg.num_layers):
        b = f"blocks.{i}"
        blocks.append({
            "norm1": lin(f"{b}.norm1"),
            "attn": mha(f"{b}.attn"),
            "norm2": lin(f"{b}.norm2"),
            "cross_attn": mha(f"{b}.cross_attn"),
            "norm3": lin(f"{b}.norm3"),
            "mlp_fc1": lin(f"{b}.mlp_fc1"),
            "gate": lin(f"{b}.gate"),
            "mlp_fc2": lin(f"{b}.mlp_fc2"),
        })
    return {
        "t_embedding": {"weight": arr("t_embedding.weight")},
        "time_embed": {"fc1": lin("time_embed.0"),
                       "fc2": lin("time_embed.2")},
        "ada_ln": {"time_mlp": lin("ada_ln.time_mlp.1"),
                   "text_mlp": lin("ada_ln.text_mlp.1")},
        "proj_in": lin("proj_in"),
        "proj_out": lin("proj_out"),
        "blocks": blocks,
    }


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def global_adaln(params, x, time_emb, text_emb):
    """ref: DiT.py:25-40. x: [B,S,H], time_emb: [B,Td], text_emb: [B,St,Xd]."""
    text_pooled = jnp.mean(text_emb, axis=1)
    tmod = dense(params["time_mlp"], jax.nn.silu(time_emb))
    xmod = dense(params["text_mlp"], jax.nn.silu(text_pooled))
    t_scale, t_shift = jnp.split(tmod, 2, axis=-1)
    x_scale, x_shift = jnp.split(xmod, 2, axis=-1)
    scale = 1.0 + t_scale + x_scale
    shift = t_shift + x_shift
    x = layer_norm({}, x)  # non-affine (ref: DiT.py:23)
    return x * scale[:, None, :] + shift[:, None, :]


def _split_heads(x, num_heads):
    b, s, h = x.shape
    return x.reshape(b, s, num_heads, h // num_heads).transpose(0, 2, 1, 3)


def _merge_heads(x):
    b, nh, s, d = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, s, nh * d)


def _qkv(params, x):
    h = x.shape[-1]
    w = params["in_proj_weight"]
    b = params["in_proj_bias"]
    qkv = dense({"weight": w, "bias": b}, x)
    return jnp.split(qkv, 3, axis=-1)


def _cross_qkv(params, x, mem):
    h = x.shape[-1]
    w = params["in_proj_weight"]
    b = params["in_proj_bias"]
    q = dense({"weight": w[:h], "bias": b[:h]}, x)
    k = dense({"weight": w[h:2 * h], "bias": b[h:2 * h]}, mem)
    v = dense({"weight": w[2 * h:], "bias": b[2 * h:]}, mem)
    return q, k, v


def _rbg_dropout(key, x, rate: float):
    """Inverted dropout with an XLA hardware-RNG keep mask."""
    kd = jax.random.key_data(key).reshape(-1).astype(jnp.uint32)
    kd = jnp.concatenate([kd, kd])[:4]                  # u32[4] RBG key
    _, bits = jax.lax.rng_bit_generator(kd, x.shape, dtype=jnp.uint32)
    thresh = jnp.uint32(min(int(rate * 2.0 ** 32), 2 ** 32 - 1))
    return jnp.where(bits >= thresh, x * (1.0 / (1.0 - rate)),
                     jnp.zeros((), x.dtype))


def prepare_cross_kv(prepared_blocks, cfg: DiTConfig, text_emb):
    """Precompute every layer's cross-attention K/V from ``text_emb``.

    The text embedding is CONSTANT across the reverse-diffusion scan, so
    projecting it inside each denoise step wastes 2 GEMMs x num_layers x
    num_steps (~10% of the sampler's FLOPs at S=750).  Call ONCE per
    sampler invocation (next to ``prepare_blocks``) and pass the result
    to ``ditto_forward(cross_kv=...)``.

    Returns ``(k, v)`` with shape [L, B, nh, St, hd] each.
    """
    nh = cfg.num_heads
    h = cfg.hidden_dim
    w = prepared_blocks["cross_attn"]["in_proj_weight"]   # [L, 3H, H]
    b = prepared_blocks["cross_attn"]["in_proj_bias"]     # [L, 3H]
    te = text_emb.astype(w.dtype)

    def proj(lo, hi):
        y = jax.lax.dot_general(
            te, w[:, lo:hi],
            dimension_numbers=(((2,), (2,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(te.dtype)                                # [B, St, L, H]
        y = y + b[:, lo:hi]
        lyr, bsz, st = y.shape[2], y.shape[0], y.shape[1]
        y = y.transpose(2, 0, 1, 3)                       # [L, B, St, H]
        y = y.reshape(lyr, bsz, st, nh, h // nh)
        return y.transpose(0, 1, 3, 2, 4)                 # [L, B, nh, St, hd]

    return proj(h, 2 * h), proj(2 * h, 3 * h)


def dit_block(params, cfg: DiTConfig, x, text_emb, rope_cs, *,
              dropout_key: Optional[jax.Array] = None,
              cross_kv=None):
    """One DiT block (ref: DiT.py:100-157). rope_cs = (cos, sin) tables."""
    nh = cfg.num_heads

    # ===== self-attention with RoPE =====
    residual = x
    xn = layer_norm(params["norm1"], x)
    q, k, v = _qkv(params["attn"], xn)
    cos, sin = rope_cs
    # RoPE applied in [B, S, H, D] layout (ref: DiT.py:118-124)
    b, s, h = q.shape
    q = apply_rope(q.reshape(b, s, nh, h // nh), cos, sin)
    k = apply_rope(k.reshape(b, s, nh, h // nh), cos, sin)
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = _split_heads(v, nh)
    attn_out = _merge_heads(attention(q, k, v))
    if not cfg.ref_compat:
        attn_out = dense(params["attn"]["out_proj"], attn_out)
    x = attn_out + residual  # quirk #2: ref skips out_proj (DiT.py:137-139)

    # ===== cross-attention to text =====
    residual = x
    xn = layer_norm(params["norm2"], x)
    if cross_kv is not None:
        # K/V precomputed once per sampler call (prepare_cross_kv) —
        # only the Q projection depends on the denoising state
        h_dim = xn.shape[-1]
        w = params["cross_attn"]["in_proj_weight"]
        bb = params["cross_attn"]["in_proj_bias"]
        q = dense({"weight": w[:h_dim], "bias": bb[:h_dim]}, xn)
        q = _split_heads(q, nh)
        k, v = cross_kv
    else:
        q, k, v = _cross_qkv(params["cross_attn"], xn, text_emb)
        q = _split_heads(q, nh)
        k = _split_heads(k, nh)
        v = _split_heads(v, nh)
    rate = cfg.cross_attn_dropout
    drop_mode = ("probs" if cfg.ref_compat else cfg.attn_dropout_mode)
    if dropout_key is not None and rate > 0.0 and drop_mode == "probs":
        # torch MHA semantics: drop attention PROBABILITIES.  This path
        # materializes [B, H, S, St] scores/probs per layer (recomputed
        # again under remat) and measured 106 ms of a 297 ms train step
        # at B=8/S=750 — kept for ref_compat / opt-in; the corrected
        # default is "output" dropout below.  The keep-mask comes from
        # XLA's hardware RngBitGenerator (threefry bernoulli alone cost
        # ~10 ms more); any iid uniform stream is valid here — training
        # regularization noise is not a parity surface.
        import math as _math
        scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                            preferred_element_type=jnp.float32)
        scores = scores / _math.sqrt(q.shape[-1])
        p = jax.nn.softmax(scores, axis=-1)
        p = _rbg_dropout(dropout_key, p, rate)
        cross = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                           preferred_element_type=jnp.float32).astype(x.dtype)
    else:
        cross = attention(q, k, v)
    cross = dense(params["cross_attn"]["out_proj"], _merge_heads(cross))
    if dropout_key is not None and rate > 0.0 and drop_mode == "output":
        # corrected default: dropout on the projected attention output —
        # same train-time regularization intent at 1/St the mask size,
        # and the attention itself stays on the fused SDPA path
        cross = _rbg_dropout(dropout_key, cross, rate)
    x = cross + residual

    # ===== gated MLP =====
    residual = x
    xn = layer_norm(params["norm3"], x)
    up = jax.nn.gelu(dense(params["mlp_fc1"], xn), approximate=False)
    gate = jax.nn.sigmoid(dense(params["gate"], xn))
    x = dense(params["mlp_fc2"], up * gate) + residual
    return x


def prepare_blocks(params, cfg: DiTConfig):
    """Stack the block params for the scanned forward and cast to the
    compute dtype.

    Call this ONCE per jitted region (outside any diffusion-step scan)
    and pass the result to ``ditto_forward(prepared_blocks=...)``: done
    inside the sampler's scan body instead, the stack + bf16 casts move
    the full parameter set (~170 MB) through HBM EVERY reverse step.
    Requires ``cfg.scan_blocks``.
    """
    cdt = jnp.dtype(cfg.compute_dtype)
    # NB: fusing mlp_fc1+gate into one [h, 2m] GEMM here measured ~5%
    # SLOWER on the 50-step sampler (XLA schedules the two 3072-wide
    # GEMMs better than one 6144-wide one at S=750) — keep them split.
    return jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves).astype(cdt), *params["blocks"])


def ditto_forward(params, cfg: DiTConfig, x, text_emb, t, *,
                  dropout_key: Optional[jax.Array] = None,
                  prepared_blocks=None, cross_kv=None):
    """Noise prediction (ref: DiTTO.py:66-94).

    x: [B, S, H] noisy latents; text_emb: [B, St, Xd]; t: [B] int32.
    """
    temb = embed(params["t_embedding"], t)
    temb = dense(params["time_embed"]["fc1"], temb)
    temb = jax.nn.silu(temb)
    temb = dense(params["time_embed"]["fc2"], temb)

    s = x.shape[1]

    x_skip = dense(params["proj_in"], x)
    x = global_adaln(params["ada_ln"], x, temb, text_emb)

    # mixed precision: bf16 operands inside the block stack (fp32 stats
    # preserved by layer_norm/softmax); params cast lazily — XLA fuses the
    # casts into the matmuls
    cdt = jnp.dtype(cfg.compute_dtype)
    blocks = params["blocks"]
    if cdt != x.dtype:
        cast = lambda t: jax.tree_util.tree_map(  # noqa: E731
            lambda a: a.astype(cdt), t)
        if prepared_blocks is None:
            blocks = cast(blocks)
        x = x.astype(cdt)
        text_emb = text_emb.astype(cdt)
    rope_cs = rope_tables(s, cfg.head_dim, dtype=x.dtype)

    block_fn = dit_block
    if cfg.remat_blocks:
        block_fn = jax.checkpoint(
            dit_block, static_argnums=(1,),
            policy=getattr(jax.checkpoint_policies, cfg.remat_policy))

    if prepared_blocks is not None or (cfg.scan_blocks
                                       and cfg.num_layers > 1):
        stacked = (prepared_blocks if prepared_blocks is not None
                   else jax.tree_util.tree_map(
                       lambda *leaves: jnp.stack(leaves), *blocks))
        keys = (jax.random.split(dropout_key, cfg.num_layers)
                if dropout_key is not None else
                jnp.zeros((cfg.num_layers, 2), jnp.uint32))

        if cross_kv is not None:
            def body(h, inp):
                blk, bkey, ckv = inp
                bkey = bkey if dropout_key is not None else None
                return block_fn(blk, cfg, h, text_emb, rope_cs,
                                dropout_key=bkey, cross_kv=ckv), None

            x, _ = jax.lax.scan(body, x, (stacked, keys, cross_kv))
        else:
            def body(h, inp):
                blk, bkey = inp
                bkey = bkey if dropout_key is not None else None
                return block_fn(blk, cfg, h, text_emb, rope_cs,
                                dropout_key=bkey), None

            x, _ = jax.lax.scan(body, x, (stacked, keys))
    else:
        keys = (jax.random.split(dropout_key, cfg.num_layers)
                if dropout_key is not None else [None] * cfg.num_layers)
        for li, (block, bkey) in enumerate(zip(blocks, keys)):
            ckv = (None if cross_kv is None
                   else (cross_kv[0][li], cross_kv[1][li]))
            x = block_fn(block, cfg, x, text_emb, rope_cs,
                         dropout_key=bkey, cross_kv=ckv)

    x = dense(params["proj_out"], x.astype(x_skip.dtype))
    return x_skip + x
