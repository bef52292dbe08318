"""Jitted train-step builders for the three models.

Each builder returns ``(init_state, step_fn)`` where step_fn is pure:
``state, metrics = step_fn(state, batch, key)`` — jit/pjit-able, donatable,
shardable over a (data, model) mesh.

Semantics mirror the reference training scripts:
  * DiTTO  — frozen NAC encode, channel-mean, GPT2 wte text conditioning,
    t ~ U[0, T), q_sample (ref-compat inverted mode optional), MSE on noise
    (ref: src/TrainDiTTO.py:55-95)
  * NAC    — reconstruction MSE + lambda * GPT2 CE (+ corrected VQ losses)
    (ref: src/TrainNAC.py:55-75, NeuralAudioCodec.py:27-67)
  * SLP    — CE over 11 duration classes + accuracy
    (ref: src/TrainSLP.py:47-57, Trainer.py:128-192)

AdamW matches the reference optimizer (torch.optim.AdamW defaults:
betas (0.9, 0.999), eps 1e-8, weight_decay 1e-6 from Trainer.fit — the
declared BETAS config is never passed, quirk per SURVEY §5.6).
"""

from __future__ import annotations

import functools
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
import optax

from ..codec import encodec as codec_mod
from ..core.config import CodecConfig, DiTConfig, NACConfig, SLPConfig
from ..diffusion.schedule import NoiseSchedule, q_sample
from ..models import dit as dit_mod
from ..models import nac as nac_mod
from ..models import slp as slp_mod
from ..text import byt5 as byt5_mod
from ..text import gpt2 as gpt2_mod


def make_adamw(learning_rate: float, weight_decay: float = 1e-6,
               flat: bool = True):
    """torch.optim.AdamW-equivalent (ref Trainer.py:69 uses defaults).

    ``flat=True`` runs the update over ONE raveled parameter vector
    instead of ~200 separate leaves: per-leaf application left the AdamW
    math as hundreds of small fusions and measured 35.6 ms/step on the
    145M-param DiT (TRAIN_BENCH r5 breakdown) vs a ~5 ms HBM bound; the
    ravel/unravel passes are two copies of the gradient vector.  Same
    math — WD/betas/eps apply uniformly, as torch AdamW defaults do."""
    base = optax.adamw(learning_rate, b1=0.9, b2=0.999, eps=1e-8,
                       weight_decay=weight_decay)
    if not flat:
        return base
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat_p, _ = ravel_pytree(params)
        return base.init(flat_p)

    def update(grads, state, params=None):
        flat_g, unravel = ravel_pytree(grads)
        flat_p, _ = ravel_pytree(params)
        upd, state = base.update(flat_g, state, flat_p)
        return unravel(upd), state

    return optax.GradientTransformation(init, update)


def _tree_stop_grad(tree):
    return jax.tree_util.tree_map(jax.lax.stop_gradient, tree)


# ---------------------------------------------------------------------------
# DiTTO diffusion training
# ---------------------------------------------------------------------------

def build_ditto_train_step(dit_cfg: DiTConfig, codec_cfg: CodecConfig,
                           gpt2_cfg: gpt2_mod.GPT2Config, *,
                           learning_rate: float = None,
                           weight_decay: float = 1e-6,
                           encode_dtype: str = "float32",
                           flat_opt: bool = True):
    lr = learning_rate if learning_rate is not None else dit_cfg.learning_rate
    # flat_opt: single-vector AdamW (see make_adamw) — pass False under
    # tensor parallelism so mu/nu mirror the param tree's TP sharding
    tx = make_adamw(lr, weight_decay, flat=flat_opt)
    schedule = NoiseSchedule.cosine(dit_cfg.diffusion_steps)
    if dit_cfg.ref_compat and dit_cfg.prediction_type != "eps":
        raise ValueError("v/x0 prediction assumes the corrected (non-"
                         "inverted) schedule; ref_compat supports eps only")

    def init_state(dit_params) -> Dict:
        return {"params": dit_params, "opt_state": tx.init(dit_params),
                "step": jnp.zeros((), jnp.int32)}

    enc_dt = jnp.dtype(encode_dtype)

    def encode_batch(frozen, batch):
        """Frozen latent/text encode (ref TrainDiTTO.py:67-73).

        ``encode_dtype="bfloat16"`` runs the frozen SEANet/LSTM encode
        with bf16 operands (fp32 conv accumulation via nn/conv): the
        encode is ~20% of the train step at B=8/S=750 and its output
        only forms the (stop-gradient) regression targets.

        If the batch already carries ``"latents"`` ([B, T, H] channel-
        meaned, from data/latents.py's one-shot precompute) the audio
        encode is skipped entirely — the latents are a FROZEN function
        of the audio, so recomputing them every epoch (~45 ms of a
        186 ms step at B=8/S=750, TRAIN_BENCH_r05) buys nothing the
        second time an utterance is seen."""
        if "latents" in batch:
            latents = batch["latents"].astype(jnp.float32)
            latents = latents[:, :gpt2_cfg.n_positions]
            text_ids = batch["text_ids"][:, :latents.shape[1]]
            text_emb = gpt2_mod.embed_tokens(frozen["gpt2"], text_ids)
            return jax.lax.stop_gradient(latents), \
                jax.lax.stop_gradient(text_emb)
        codec, audio = frozen["codec"], batch["audio"]
        if enc_dt != jnp.float32:
            codec = jax.tree_util.tree_map(
                lambda a: a.astype(enc_dt)
                if a.dtype == jnp.float32 else a, codec)
            audio = audio.astype(enc_dt)
        latents, _ = nac_mod.audio_encoder(
            {"embedding_head": frozen["embedding_head"]},
            codec, codec_cfg, audio,
            batch.get("padding_mask"))
        latents = latents.astype(jnp.float32)
        latents = latents[:, :, :gpt2_cfg.n_positions]
        latents = jnp.mean(latents, axis=1)                   # [B, T, H]
        t_len = latents.shape[1]
        text_ids = batch["text_ids"][:, :t_len]
        text_emb = gpt2_mod.embed_tokens(frozen["gpt2"], text_ids)
        return jax.lax.stop_gradient(latents), \
            jax.lax.stop_gradient(text_emb)

    def loss_fn(dit_params, latents, text_emb, key):
        b = latents.shape[0]
        k_t, k_n, k_d = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (b,), 0, dit_cfg.diffusion_steps)
        noise = jax.random.normal(k_n, latents.shape, latents.dtype)
        noisy = q_sample(schedule, latents, t, noise,
                         ref_compat=dit_cfg.ref_compat)
        pred = dit_mod.ditto_forward(dit_params, dit_cfg, noisy, text_emb, t,
                                     dropout_key=k_d)
        # target parameterization (config.prediction_type): "eps" is the
        # reference objective (TrainDiTTO.py:80-85); "v"/"x0" weight the
        # conditioning gradient evenly across t (see DiTConfig docstring)
        if dit_cfg.prediction_type == "eps":
            target = noise
        else:
            ab = schedule.alphas_cumprod[t].reshape((b,) + (1,) *
                                                    (latents.ndim - 1))
            if dit_cfg.prediction_type == "x0":
                target = latents
            elif dit_cfg.prediction_type == "v":
                target = jnp.sqrt(ab) * noise - jnp.sqrt(1.0 - ab) * latents
            else:
                raise ValueError(
                    f"unknown prediction_type {dit_cfg.prediction_type!r}")
        return jnp.mean(jnp.square(pred - target))

    def step_fn(state, frozen, batch, key) -> Tuple[Dict, Dict]:
        latents, text_emb = encode_batch(frozen, batch)
        loss, grads = jax.value_and_grad(loss_fn)(
            state["params"], latents, text_emb, key)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        new_state = {"params": params, "opt_state": opt_state,
                     "step": state["step"] + 1}
        return new_state, {"loss": loss}

    def eval_fn(state, frozen, batch, key) -> Dict:
        latents, text_emb = encode_batch(frozen, batch)
        return {"loss": loss_fn(state["params"], latents, text_emb, key)}

    return init_state, step_fn, eval_fn


# ---------------------------------------------------------------------------
# NAC training
# ---------------------------------------------------------------------------

def build_nac_train_step(nac_cfg: NACConfig, codec_cfg: CodecConfig,
                         gpt2_cfg: gpt2_mod.GPT2Config, *,
                         ref_compat: bool = False,
                         learning_rate: float = None,
                         weight_decay: float = 1e-6):
    lr = learning_rate if learning_rate is not None else nac_cfg.learning_rate
    tx = make_adamw(lr, weight_decay)

    def init_state(trainable) -> Dict:
        return {"params": trainable, "opt_state": tx.init(trainable),
                "step": jnp.zeros((), jnp.int32)}

    def loss_fn(trainable, frozen, batch):
        out = nac_mod.nac_forward(
            trainable, _tree_stop_grad(frozen["codec"]),
            _tree_stop_grad(frozen["gpt2"]), nac_cfg, codec_cfg, gpt2_cfg,
            batch["text_ids"], batch["text_mask"], batch["audio"],
            batch.get("padding_mask"), ref_compat=ref_compat)
        metrics = {k: v for k, v in out.items()
                   if v.ndim == 0}
        return out["total_loss"], metrics

    def step_fn(state, frozen, batch, key=None) -> Tuple[Dict, Dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], frozen, batch)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "opt_state": opt_state,
                 "step": state["step"] + 1}, metrics)

    def eval_fn(state, frozen, batch, key=None) -> Dict:
        _, metrics = loss_fn(state["params"], frozen, batch)
        return metrics

    return init_state, step_fn, eval_fn


# ---------------------------------------------------------------------------
# SLP training
# ---------------------------------------------------------------------------

def build_slp_train_step(slp_cfg: SLPConfig, codec_cfg: CodecConfig,
                         byt5_cfg: byt5_mod.ByT5Config, *,
                         learning_rate: float = None,
                         weight_decay: float = 1e-6):
    lr = learning_rate if learning_rate is not None else slp_cfg.learning_rate
    tx = make_adamw(lr, weight_decay)

    def init_state(trainable) -> Dict:
        return {"params": trainable, "opt_state": tx.init(trainable),
                "step": jnp.zeros((), jnp.int32)}

    def loss_fn(trainable, frozen, batch):
        logits = slp_mod.slp_forward(
            trainable, _tree_stop_grad(frozen["byt5"]),
            _tree_stop_grad(frozen["codec"]), slp_cfg, byt5_cfg, codec_cfg,
            batch["text_ids"], batch["text_mask"], batch["audio"],
            batch.get("padding_mask"))
        labels = batch["label"]
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
        loss = jnp.mean(nll)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels)
                       .astype(jnp.float32))
        return loss, {"loss": loss, "accuracy": acc}

    def step_fn(state, frozen, batch, key=None) -> Tuple[Dict, Dict]:
        (_, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state["params"], frozen, batch)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        return ({"params": params, "opt_state": opt_state,
                 "step": state["step"] + 1}, metrics)

    def eval_fn(state, frozen, batch, key=None) -> Dict:
        _, metrics = loss_fn(state["params"], frozen, batch)
        return metrics

    return init_state, step_fn, eval_fn
