"""conv1d_nlc_pallas vs the jnp tap-sum oracle (interpret mode on CPU)."""

import numpy as np

import jax
import jax.numpy as jnp

from ditto_tts_tpu.nn.conv import conv1d_nlc_gemm
from ditto_tts_tpu.ops.conv_pallas import conv1d_nlc_pallas


def _case(b, t, c, o, k, dil, rng, bias=True, dtype=jnp.float32,
          **kw):
    x = jnp.asarray(rng.standard_normal((b, t, c)), dtype)
    w = jnp.asarray(0.1 * rng.standard_normal((o, c, k)), jnp.float32)
    bv = (jnp.asarray(rng.standard_normal(o), jnp.float32)
          if bias else None)
    want = np.asarray(conv1d_nlc_gemm(x, w, bv, dilation=dil,
                                      compute_dtype=dtype), np.float32)
    got = np.asarray(conv1d_nlc_pallas(x, w, bv, dilation=dil,
                                       compute_dtype=dtype,
                                       interpret=True, **kw), np.float32)
    assert got.shape == want.shape, (got.shape, want.shape)
    return got, want


def test_matches_oracle_fp32():
    rng = np.random.default_rng(0)
    for b, t, c, o, k, dil in [(1, 64, 16, 16, 3, 1),
                               (2, 200, 24, 24, 11, 5),
                               (1, 300, 32, 64, 7, 3),
                               (2, 97, 8, 8, 3, 1)]:
        got, want = _case(b, t, c, o, k, dil, rng)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matches_oracle_no_bias():
    rng = np.random.default_rng(1)
    got, want = _case(1, 128, 16, 16, 7, 1, rng, bias=False)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_matches_oracle_bf16_operands():
    """bf16 operands, fp32 accumulation: the pallas kernel keeps the whole
    tap sum in fp32 while the gemm oracle rounds partials; both cast once
    at the end, so they agree to bf16 resolution."""
    rng = np.random.default_rng(2)
    got, want = _case(2, 160, 16, 16, 11, 5, rng, dtype=jnp.bfloat16)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_oc_blocking_and_multi_time_blocks():
    rng = np.random.default_rng(3)
    # o=64 with oc_block=32 forces two oc blocks; t=600/bt=128 -> 5 blocks
    got, want = _case(1, 600, 16, 64, 7, 3, rng, block_t=128, oc_block=32)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_vocoder_pallas_conv_impl_matches_gemm(monkeypatch):
    # off-TPU the dispatchers skip pallas entirely; force the
    # interpret-mode dispatch so this test pins the kernel path
    from ditto_tts_tpu.ops import conv_pallas as cp
    monkeypatch.setattr(cp, 'FORCE_INTERPRET', True)
    """Full BigVGAN forward with conv_impl='pallas' (interpret off-TPU)
    vs the gemm lowering, fp32 so both are exact."""
    from ditto_tts_tpu.core.config import VocoderConfig
    from ditto_tts_tpu.models.vocoder import bigvgan_forward, init_bigvgan

    cfg = VocoderConfig(
        num_mels=8, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=16, resblock_kernel_sizes=(3,),
        resblock_dilation_sizes=((1, 3),),
        compute_dtype="float32", carry_dtype="float32")
    params = init_bigvgan(jax.random.key(5), cfg)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 if a.ndim == 1 else a, params)
    mel = jnp.asarray(np.random.default_rng(6)
                      .standard_normal((2, 8, 20)).astype(np.float32))
    want = np.asarray(bigvgan_forward(params, cfg, mel))
    got = np.asarray(bigvgan_forward(
        params, cfg.replace(conv_impl="pallas"), mel))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_taps2_upsample_shape():
    """The polyphase-rewritten transposed conv is a taps=2 VALID conv."""
    rng = np.random.default_rng(4)
    got, want = _case(2, 130, 32, 64, 2, 1, rng)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ncl_variant_matches_oracle():
    from ditto_tts_tpu.nn.conv import conv1d
    from ditto_tts_tpu.ops.conv_pallas import conv1d_ncl_pallas

    rng = np.random.default_rng(9)
    for b, c, o, t, k, dil in [(1, 8, 8, 300, 3, 1), (2, 16, 16, 400, 7, 3),
                               (1, 24, 24, 520, 11, 5), (2, 8, 16, 290, 7, 1)]:
        x = jnp.asarray(rng.standard_normal((b, c, t)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((o, c, k)), jnp.float32)
        bv = jnp.asarray(rng.standard_normal(o), jnp.float32)
        want = np.asarray(conv1d(x, w, bv, dilation=dil))
        got = np.asarray(conv1d_ncl_pallas(x, w, bv, dilation=dil,
                                           interpret=True, block_t=256))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ncl_variant_bf16():
    from ditto_tts_tpu.ops.conv_pallas import conv1d_ncl_pallas
    from ditto_tts_tpu.nn.conv import conv1d

    rng = np.random.default_rng(10)
    b, c, t, k, dil = 1, 16, 600, 7, 3
    x = jnp.asarray(rng.standard_normal((b, c, t)), jnp.bfloat16)
    w = jnp.asarray(0.1 * rng.standard_normal((c, c, k)), jnp.float32)
    want = np.asarray(conv1d(x, w, None, dilation=dil,
                             compute_dtype=jnp.bfloat16), np.float32)
    got = np.asarray(conv1d_ncl_pallas(x, w, None, dilation=dil,
                                       compute_dtype=jnp.bfloat16,
                                       interpret=True), np.float32)
    np.testing.assert_allclose(got, want, rtol=2e-2, atol=2e-2)


def test_codec_pallas_conv_impl_matches_xla(monkeypatch):
    # off-TPU the dispatchers skip pallas entirely; force the
    # interpret-mode dispatch so this test pins the kernel path
    from ditto_tts_tpu.ops import conv_pallas as cp
    monkeypatch.setattr(cp, 'FORCE_INTERPRET', True)
    """SEANet encode/decode with conv_impl='pallas' vs the lax path."""
    from ditto_tts_tpu.codec import encodec as codec_mod
    from ditto_tts_tpu.core.config import CodecConfig

    cfg = CodecConfig(num_filters=8, dimension=16, ratios=(4, 2),
                      codebook_size=32, num_quantizers=4, lstm_layers=1)
    params = codec_mod.init_codec(jax.random.key(11), cfg)
    rng = np.random.default_rng(12)
    audio = jnp.asarray(0.1 * rng.standard_normal((2, 1, 512)), jnp.float32)

    want_lat = codec_mod.codec_encode(params, cfg.replace(conv_impl="xla"),
                                      audio, None)
    got_lat = codec_mod.codec_encode(params, cfg, audio, None)
    np.testing.assert_array_equal(np.asarray(got_lat), np.asarray(want_lat))

    want = codec_mod.codec_decode(params, cfg.replace(conv_impl="xla"),
                                  want_lat, output_length=512)
    got = codec_mod.codec_decode(params, cfg, got_lat, output_length=512)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


def test_short_sequence_falls_back_nlc():
    """T below the halo requirement must not assert — the kernel entry
    falls back to the gemm tap-sum (ADVICE r4: a sub-second mel at
    k=11/dil=5 hit the halo assertion through the width-only dispatch)."""
    rng = np.random.default_rng(20)
    # k=11, dil=5: halo_a = 64 > roundup(t_out=30-50... pick t small
    got, want = _case(1, 40, 16, 16, 11, 3, rng)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_short_sequence_falls_back_ncl():
    from ditto_tts_tpu.nn.conv import conv1d
    from ditto_tts_tpu.ops.conv_pallas import conv1d_ncl_pallas

    rng = np.random.default_rng(21)
    # t_out = 90 < halo_a = 128 for k=11/dil=5 -> lax fallback
    x = jnp.asarray(rng.standard_normal((1, 16, 140)), jnp.float32)
    w = jnp.asarray(0.1 * rng.standard_normal((16, 16, 11)), jnp.float32)
    bv = jnp.asarray(rng.standard_normal(16), jnp.float32)
    want = np.asarray(conv1d(x, w, bv, dilation=5))
    got = np.asarray(conv1d_ncl_pallas(x, w, bv, dilation=5,
                                       interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ncl_windowed_matches_oracle():
    from ditto_tts_tpu.nn.conv import conv1d
    from ditto_tts_tpu.ops.conv_pallas import conv1d_ncl_pallas

    rng = np.random.default_rng(30)
    for b, c, o, t, k, dil in [(1, 8, 8, 300, 3, 1), (2, 16, 16, 400, 7, 3),
                               (1, 24, 24, 520, 11, 5),
                               (2, 32, 64, 300, 7, 1)]:
        x = jnp.asarray(rng.standard_normal((b, c, t)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((o, c, k)), jnp.float32)
        bv = jnp.asarray(rng.standard_normal(o), jnp.float32)
        want = np.asarray(conv1d(x, w, bv, dilation=dil))
        got = np.asarray(conv1d_ncl_pallas(x, w, bv, dilation=dil,
                                           interpret=True, block_t=256,
                                           windowed=True))
        assert got.shape == want.shape
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_ncl_batched_matches_oracle():
    from ditto_tts_tpu.nn.conv import conv1d
    from ditto_tts_tpu.ops.conv_pallas import conv1d_ncl_batched_pallas

    rng = np.random.default_rng(40)
    for b, c, o, t, k, dil in [(4, 8, 8, 300, 3, 1), (2, 16, 8, 400, 3, 1),
                               (8, 16, 16, 290, 3, 1),
                               (1, 16, 16, 300, 3, 1)]:  # b=1 -> fallback
        x = jnp.asarray(rng.standard_normal((b, c, t)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((o, c, k)), jnp.float32)
        bv = jnp.asarray(rng.standard_normal(o), jnp.float32)
        want = np.asarray(conv1d(x, w, bv, dilation=dil))
        got = np.asarray(conv1d_ncl_batched_pallas(
            x, w, bv, dilation=dil, interpret=True, block_t=256))
        assert got.shape == want.shape, (got.shape, want.shape)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
