"""ECAPA-TDNN tests: invariants + golden oracle.

The oracle is ``eval/torch_ecapa.py`` — a torch rebuild with speechbrain's
module naming (speechbrain isn't installed here), same recipe as the
BigVGAN golden tests: random-init torch model -> state_dict ->
``import_speechbrain_state_dict`` -> compare ``ecapa_embed`` outputs.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ditto_tts_tpu.models.ecapa import ECAPAConfig, ecapa_embed, init_ecapa

CFG = ECAPAConfig(input_features=12, channels=16, out_channels=24,
                  embedding_dim=8, scale=4, se_channels=6,
                  attention_channels=6)


def test_embedding_shape_and_finite():
    params = init_ecapa(jax.random.key(0), CFG)
    feats = jnp.asarray(np.random.default_rng(0)
                        .standard_normal((3, 50, 12)).astype(np.float32))
    emb = ecapa_embed(params, CFG, feats)
    assert emb.shape == (3, 8)
    assert np.isfinite(np.asarray(emb)).all()


def test_same_speaker_same_embedding():
    params = init_ecapa(jax.random.key(1), CFG)
    feats = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((1, 40, 12)).astype(np.float32))
    a = ecapa_embed(params, CFG, feats)
    b = ecapa_embed(params, CFG, feats)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mask_excludes_padding():
    """Embedding of [x ; pad] with mask == embedding of x alone."""
    params = init_ecapa(jax.random.key(2), CFG)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((1, 30, 12)).astype(np.float32)
    pad = np.zeros((1, 10, 12), np.float32)
    full = jnp.asarray(np.concatenate([x, pad], axis=1))
    mask = jnp.asarray(np.concatenate(
        [np.ones((1, 30)), np.zeros((1, 10))], axis=1).astype(np.int32))
    a = ecapa_embed(params, CFG, jnp.asarray(x))
    b = ecapa_embed(params, CFG, full, mask)
    # conv receptive fields bleed slightly across the boundary; statistics
    # pooling is exactly masked, so embeddings agree closely
    cos = float(np.sum(np.asarray(a) * np.asarray(b))
                / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99, cos


def test_batch_independence():
    params = init_ecapa(jax.random.key(3), CFG)
    rng = np.random.default_rng(3)
    x1 = rng.standard_normal((1, 25, 12)).astype(np.float32)
    x2 = rng.standard_normal((1, 25, 12)).astype(np.float32)
    both = ecapa_embed(params, CFG, jnp.asarray(
        np.concatenate([x1, x2], axis=0)))
    solo = ecapa_embed(params, CFG, jnp.asarray(x1))
    np.testing.assert_allclose(np.asarray(both[0]), np.asarray(solo[0]),
                               rtol=1e-4, atol=1e-5)


def test_importer_shapes_roundtrip():
    """Build a synthetic speechbrain-named state dict and import it."""
    from ditto_tts_tpu.models.ecapa import import_speechbrain_state_dict
    rng = np.random.default_rng(4)
    cfg = CFG
    sub = cfg.channels // cfg.scale

    sd = {}

    def conv(n, o, i, k):
        sd[f"{n}.conv.weight"] = rng.standard_normal((o, i, k)) \
            .astype(np.float32)
        sd[f"{n}.conv.bias"] = np.zeros(o, np.float32)

    def bn(n, c):
        sd[f"{n}.norm.weight"] = np.ones(c, np.float32)
        sd[f"{n}.norm.bias"] = np.zeros(c, np.float32)
        sd[f"{n}.norm.running_mean"] = np.zeros(c, np.float32)
        sd[f"{n}.norm.running_var"] = np.ones(c, np.float32)

    def tdnn(n, o, i, k):
        conv(f"{n}.conv", o, i, k)
        bn(f"{n}.norm", o)

    tdnn("blocks.0", cfg.channels, cfg.input_features, cfg.kernel)
    for b in range(1, 4):
        tdnn(f"blocks.{b}.tdnn1", cfg.channels, cfg.channels, 1)
        for i in range(cfg.scale - 1):
            tdnn(f"blocks.{b}.res2net_block.blocks.{i}", sub, sub,
                 cfg.res_kernel)
        tdnn(f"blocks.{b}.tdnn2", cfg.channels, cfg.channels, 1)
        conv(f"blocks.{b}.se_block.conv1", cfg.se_channels, cfg.channels, 1)
        conv(f"blocks.{b}.se_block.conv2", cfg.channels, cfg.se_channels, 1)
    tdnn("mfa", cfg.out_channels, 3 * cfg.channels, 1)
    conv("asp.tdnn.conv", cfg.attention_channels, 3 * cfg.out_channels, 1)
    bn("asp.tdnn.norm", cfg.attention_channels)
    conv("asp.conv", cfg.out_channels, cfg.attention_channels, 1)
    bn("asp_bn", 2 * cfg.out_channels)
    conv("fc", cfg.embedding_dim, 2 * cfg.out_channels, 1)

    params = import_speechbrain_state_dict(sd, cfg)
    feats = jnp.ones((1, 20, cfg.input_features))
    emb = ecapa_embed(params, cfg, feats)
    assert emb.shape == (1, cfg.embedding_dim)
    assert np.isfinite(np.asarray(emb)).all()


class TestGoldenVsTorchOracle:
    """Full-geometry golden test against the speechbrain-named torch
    rebuild (VERDICT r2 missing #3): validates every key in
    ``import_speechbrain_state_dict`` and the numerics of
    ``ecapa_embed`` at the spkrec-ecapa-voxceleb geometry."""

    def _run(self, prefix):
        import torch

        from ditto_tts_tpu.eval.torch_ecapa import build_random_ecapa
        from ditto_tts_tpu.models.ecapa import import_speechbrain_state_dict

        oracle = build_random_ecapa(seed=7)
        sd = {prefix + k: v.detach().numpy()
              for k, v in oracle.state_dict().items()}
        # num_batches_tracked buffers are not parameters we consume
        sd = {k: v for k, v in sd.items()
              if not k.endswith("num_batches_tracked")}
        cfg = ECAPAConfig()
        params = import_speechbrain_state_dict(sd, cfg)

        rng = np.random.default_rng(11)
        feats = rng.standard_normal((2, 120, 80)).astype(np.float32)
        with torch.no_grad():
            want = oracle(torch.from_numpy(feats)).numpy()
        got = np.asarray(ecapa_embed(params, cfg, jnp.asarray(feats)))
        assert want.shape == got.shape == (2, 192)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)

    def test_bare_keys(self):
        self._run("")

    def test_embedding_model_prefix(self):
        """The downloaded speechbrain ckpt prefixes embedding_model."""
        self._run("embedding_model.")
