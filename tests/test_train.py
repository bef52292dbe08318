"""Train-step, checkpoint, and Trainer tests (tiny configs, CPU)."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ditto_tts_tpu.codec import encodec as codec_mod
from ditto_tts_tpu.core.config import CodecConfig, DiTConfig, NACConfig, SLPConfig
from ditto_tts_tpu.models import dit as dit_mod
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.models import slp as slp_mod
from ditto_tts_tpu.text import byt5 as byt5_mod
from ditto_tts_tpu.text import gpt2 as gpt2_mod
from ditto_tts_tpu.train import steps as steps_mod
from ditto_tts_tpu.train.checkpoint import (latest_checkpoint,
                                            load_checkpoint, save_checkpoint)
from ditto_tts_tpu.train.trainer import Trainer

HID = 12
CODEC_CFG = CodecConfig(num_filters=4, dimension=8, ratios=(2, 2, 2),
                        codebook_size=16, num_quantizers=4, lstm_layers=1)
DIT_CFG = DiTConfig(hidden_dim=HID, num_layers=1, num_heads=2, time_dim=8,
                    text_dim=HID, diffusion_steps=10, max_token_length=64)
GPT2_CFG = gpt2_mod.GPT2Config(vocab_size=32, n_positions=64, n_embd=HID,
                               n_layer=1, n_head=2)
NAC_CFG = NACConfig(hidden_size=HID, codebook_size=16)


def _ditto_fixtures():
    keys = jax.random.split(jax.random.key(0), 4)
    dit_params = dit_mod.init_ditto(keys[0], DIT_CFG)
    frozen = {
        "codec": codec_mod.init_codec(keys[1], CODEC_CFG),
        "gpt2": gpt2_mod.init_gpt2(keys[2], GPT2_CFG),
        "embedding_head": nac_mod.init_nac_trainable(
            keys[3], NAC_CFG)["embedding_head"],
    }
    batch = {
        "audio": jnp.asarray(0.1 * np.random.default_rng(0)
                             .standard_normal((2, 1, 128)), jnp.float32),
        "padding_mask": jnp.ones((2, 128), jnp.int32),
        "text_ids": jnp.zeros((2, 64), jnp.int32),
    }
    return dit_params, frozen, batch


def test_ditto_train_step_reduces_loss():
    dit_params, frozen, batch = _ditto_fixtures()
    init_state, step_fn, eval_fn = steps_mod.build_ditto_train_step(
        DIT_CFG, CODEC_CFG, GPT2_CFG, learning_rate=1e-3)
    state = init_state(dit_params)
    step = jax.jit(step_fn)
    losses = []
    for i in range(30):
        state, m = step(state, frozen, batch, jax.random.key(i % 3))
        losses.append(float(m["loss"]))
    assert int(state["step"]) == 30
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses[:3] + losses[-3:]
    ev = eval_fn(state, frozen, batch, jax.random.key(0))
    assert np.isfinite(float(ev["loss"]))


def test_nac_train_step_runs():
    trainable = nac_mod.init_nac_trainable(jax.random.key(1), NAC_CFG)
    frozen = {"codec": codec_mod.init_codec(jax.random.key(2), CODEC_CFG),
              "gpt2": gpt2_mod.init_gpt2(jax.random.key(3), GPT2_CFG)}
    batch = {
        "audio": jnp.asarray(0.1 * np.random.default_rng(1)
                             .standard_normal((2, 1, 128)), jnp.float32),
        "padding_mask": jnp.ones((2, 128), jnp.int32),
        "text_ids": jnp.zeros((2, 64), jnp.int32),
        "text_mask": jnp.ones((2, 64), jnp.int32),
    }
    init_state, step_fn, eval_fn = steps_mod.build_nac_train_step(
        NAC_CFG, CODEC_CFG, GPT2_CFG)
    state = init_state(trainable)
    state, m = jax.jit(step_fn)(state, frozen, batch)
    assert np.isfinite(float(m["total_loss"]))
    assert "reconstruction_loss" in m and "lm_loss" in m


def test_slp_train_step_learns_constant_label():
    byt5_cfg = byt5_mod.ByT5Config(vocab_size=40, d_model=16, d_kv=4,
                                   d_ff=32, num_layers=1, num_heads=2)
    slp_cfg = SLPConfig(embedding_dim=16, num_layers=1, num_heads=1)
    trainable = slp_mod.init_slp_trainable(jax.random.key(4), slp_cfg,
                                           codebook_size=16)
    frozen = {"codec": codec_mod.init_codec(jax.random.key(5), CODEC_CFG),
              "byt5": byt5_mod.init_byt5(jax.random.key(6), byt5_cfg)}
    batch = {
        "audio": jnp.asarray(0.1 * np.random.default_rng(2)
                             .standard_normal((2, 1, 128)), jnp.float32),
        "padding_mask": jnp.ones((2, 128), jnp.int32),
        "text_ids": jnp.zeros((2, 8), jnp.int32),
        "text_mask": jnp.ones((2, 8), jnp.int32),
        "label": jnp.asarray([3, 3], jnp.int32),
    }
    init_state, step_fn, eval_fn = steps_mod.build_slp_train_step(
        slp_cfg, CODEC_CFG, byt5_cfg, learning_rate=3e-3)
    state = init_state(trainable)
    step = jax.jit(step_fn)
    first = None
    for i in range(25):
        state, m = step(state, frozen, batch)
        if first is None:
            first = float(m["loss"])
    assert float(m["loss"]) < first
    assert float(m["accuracy"]) == 1.0


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": {"b": jnp.arange(6.0).reshape(2, 3)},
            "blocks": [{"w": jnp.ones((2,))}, {"w": jnp.zeros((2,))}],
            "step": jnp.asarray(7)}
    path = str(tmp_path / "ck" / "model_epoch_3.npz")
    save_checkpoint(path, tree, metadata={"epoch": 3})
    loaded, meta = load_checkpoint(path)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(loaded["a"]["b"],
                                  np.arange(6.0).reshape(2, 3))
    assert isinstance(loaded["blocks"], list) and len(loaded["blocks"]) == 2
    np.testing.assert_array_equal(loaded["blocks"][1]["w"], [0, 0])
    assert latest_checkpoint(str(tmp_path / "ck"), prefix="model") == path


def test_trainer_fit_and_resume(tmp_path):
    dit_params, frozen, batch = _ditto_fixtures()
    init_state, step_fn, eval_fn = steps_mod.build_ditto_train_step(
        DIT_CFG, CODEC_CFG, GPT2_CFG, learning_rate=1e-3)
    ckdir = str(tmp_path / "ck")

    def run(epochs):
        trainer = Trainer(step_fn, eval_fn, donate_state=False)
        return trainer.fit(
            init_state(dit_params), frozen,
            train_batches=lambda: [batch, batch],
            val_batches=lambda: [batch],
            epochs=epochs, key=jax.random.key(0), model_name="dit",
            checkpoint_dir=ckdir, checkpoint_interval=1,
            log_path=str(tmp_path / "log.jsonl"))

    state, history = run(2)
    assert len(history["train"]["loss"]) == 2
    assert os.path.exists(os.path.join(ckdir, "dit_epoch_2.npz"))
    assert os.path.exists(os.path.join(ckdir, "dit_final.npz"))
    # resume: epoch 2 checkpoint exists -> fitting to 3 runs only 1 epoch
    state2, history2 = run(3)
    assert len(history2["train"]["loss"]) == 3
    # log is JSONL
    lines = open(str(tmp_path / "log.jsonl")).read().strip().split("\n")
    assert len(lines) >= 3
    import json as _json
    rec = _json.loads(lines[0])
    assert "train" in rec and "epoch" in rec


def test_checkpoint_restore_by_path(tmp_path):
    """save -> load round-trips a params+AdamW state; a structurally
    mutated template fails loudly instead of silently mis-assigning."""
    import optax
    from ditto_tts_tpu.train.checkpoint import restore_into, save_checkpoint

    params = {"b_layer": {"weight": jnp.arange(6.0).reshape(2, 3)},
              "a_layer": [{"w": jnp.ones((2,))}, {"w": 2.0 * jnp.ones((2,))}]}
    opt = optax.adamw(1e-3)
    state = {"params": params, "opt": opt.init(params), "step": jnp.array(3)}
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, state)

    restored = restore_into(state, path)
    for (p1, l1), (p2, l2) in zip(
            jax.tree_util.tree_flatten_with_path(state)[0],
            jax.tree_util.tree_flatten_with_path(restored)[0]):
        assert p1 == p2
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    # mutated structure: renamed key -> loud failure
    bad = {"params": {"b_layer": params["b_layer"],
                      "renamed": params["a_layer"]},
           "opt": opt.init(params), "step": jnp.array(0)}
    with pytest.raises(KeyError):
        restore_into(bad, path)

    # mutated shape -> loud failure
    bad2 = jax.tree_util.tree_map(lambda a: a, state)
    bad2["params"]["b_layer"]["weight"] = jnp.zeros((3, 2))
    with pytest.raises(ValueError):
        restore_into(bad2, path)
