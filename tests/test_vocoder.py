"""BigVGAN generator tests: shape contract, importer, determinism."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ditto_tts_tpu.core.config import VocoderConfig
from ditto_tts_tpu.models.vocoder import (bigvgan_forward,
                                          import_bigvgan_state_dict,
                                          init_bigvgan)

TINY = VocoderConfig(
    num_mels=8,
    upsample_rates=(2, 2),
    upsample_kernel_sizes=(4, 4),
    upsample_initial_channel=16,
    resblock_kernel_sizes=(3,),
    resblock_dilation_sizes=((1, 3),),
)


def test_output_shape_is_rate_product():
    params = init_bigvgan(jax.random.key(0), TINY)
    mel = jnp.zeros((2, 8, 10))
    wav = bigvgan_forward(params, TINY, mel)
    assert wav.shape == (2, 1, 40)  # 10 * 2 * 2


def test_output_clipped_and_finite():
    params = init_bigvgan(jax.random.key(1), TINY)
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((1, 8, 12)).astype(np.float32))
    wav = np.asarray(bigvgan_forward(params, TINY, mel))
    assert np.isfinite(wav).all()
    assert wav.max() <= 1.0 and wav.min() >= -1.0


def test_no_antialiasing_path():
    cfg = TINY.replace(use_anti_aliasing=False)
    params = init_bigvgan(jax.random.key(2), cfg)
    wav = bigvgan_forward(params, cfg, jnp.zeros((1, 8, 5)))
    assert wav.shape == (1, 1, 20)


def test_polyphase_impl_matches_composed():
    params = init_bigvgan(jax.random.key(3), TINY)
    # non-zero snake params so the activation actually bends
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 if a.ndim == 1 else a, params)
    mel = jnp.asarray(np.random.default_rng(1)
                      .standard_normal((2, 8, 20)).astype(np.float32))
    # impl-equivalence check runs in fp32 (a bf16 carry rounds differently
    # per impl); oracle impls only exist in the torch-like ncl layout
    f32 = TINY.replace(compute_dtype="float32", carry_dtype="float32")
    composed = np.asarray(bigvgan_forward(params, f32, mel,
                                          aa_impl="composed", layout="ncl"))
    poly = np.asarray(bigvgan_forward(params, f32, mel,
                                      aa_impl="polyphase", layout="ncl"))
    np.testing.assert_allclose(poly, composed, rtol=2e-5, atol=2e-5)


def test_bf16_conv_compute_quality():
    """bf16 conv operands (fp32 accum + fp32 activations) must stay within
    ~0.3% of the fp32 reference — >40 dB SNR on random-init weights."""
    cfg = TINY.replace(resblock_dilation_sizes=((1, 3, 5),))
    params = init_bigvgan(jax.random.key(4), cfg)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 1 else a, params)
    mel = jnp.asarray(np.random.default_rng(2)
                      .standard_normal((2, 8, 40)).astype(np.float32))
    w32 = np.asarray(bigvgan_forward(
        params, cfg.replace(compute_dtype="float32",
                            carry_dtype="float32"), mel))
    w16 = np.asarray(bigvgan_forward(
        params, cfg.replace(compute_dtype="bfloat16",
                            carry_dtype="float32"), mel))
    err = ((w16 - w32) ** 2).mean()
    snr = 10 * np.log10((w32 ** 2).mean() / max(err, 1e-20))
    assert snr > 40.0, snr


def test_bf16_carry_quality():
    """Full bf16 fast path (bf16 carry between ops AND bf16 conv operands)
    vs the all-fp32 reference: the accumulated carry rounding through the
    ~40 sequential ops costs ~8 dB over the conv-compute-only contract —
    the >28 dB floor pins the production default."""
    cfg = TINY.replace(resblock_dilation_sizes=((1, 3, 5),))
    params = init_bigvgan(jax.random.key(4), cfg)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.05 if a.ndim == 1 else a, params)
    mel = jnp.asarray(np.random.default_rng(2)
                      .standard_normal((2, 8, 40)).astype(np.float32))
    w32 = np.asarray(bigvgan_forward(
        params, cfg.replace(compute_dtype="float32",
                            carry_dtype="float32"), mel))
    w16 = np.asarray(bigvgan_forward(params, cfg, mel))
    err = ((w16 - w32) ** 2).mean()
    snr = 10 * np.log10((w32 ** 2).mean() / max(err, 1e-20))
    assert snr > 28.0, snr


@pytest.mark.parametrize("carry", ["float32", "bfloat16"])
@pytest.mark.parametrize("compute", ["float32", "bfloat16"])
def test_dtype_config_matrix(carry, compute):
    """Every (carry_dtype, compute_dtype) combination must run; the fp32/fp32
    corner is the documented bit-exact parity configuration."""
    cfg = TINY.replace(carry_dtype=carry, compute_dtype=compute)
    params = init_bigvgan(jax.random.key(7), cfg)
    mel = jnp.asarray(np.random.default_rng(5)
                      .standard_normal((1, 8, 16)).astype(np.float32))
    wav = np.asarray(bigvgan_forward(params, cfg, mel))
    assert wav.shape == (1, 1, 64)
    assert np.isfinite(wav).all()


def test_importer_from_torch_naming():
    torch = pytest.importorskip("torch")
    # build a state_dict in BigVGAN naming (plain .weight — no weight norm)
    g = torch.Generator().manual_seed(0)

    def w(*shape):
        return torch.randn(*shape, generator=g).numpy() * 0.1

    ch0 = TINY.upsample_initial_channel
    sd = {
        "conv_pre.weight": w(ch0, TINY.num_mels, 7),
        "conv_pre.bias": w(ch0),
    }
    ch = ch0
    nk = len(TINY.resblock_kernel_sizes)
    for i, (rate, k) in enumerate(zip(TINY.upsample_rates,
                                      TINY.upsample_kernel_sizes)):
        sd[f"ups.{i}.0.weight"] = w(ch, ch // 2, k)
        sd[f"ups.{i}.0.bias"] = w(ch // 2)
        ch //= 2
        for j, dils in enumerate(TINY.resblock_dilation_sizes):
            b = f"resblocks.{i * nk + j}"
            for m, _ in enumerate(dils):
                rk = TINY.resblock_kernel_sizes[j]
                sd[f"{b}.convs1.{m}.weight"] = w(ch, ch, rk)
                sd[f"{b}.convs1.{m}.bias"] = w(ch)
                sd[f"{b}.convs2.{m}.weight"] = w(ch, ch, rk)
                sd[f"{b}.convs2.{m}.bias"] = w(ch)
                sd[f"{b}.activations.{2 * m}.act.alpha"] = w(ch)
                sd[f"{b}.activations.{2 * m}.act.beta"] = w(ch)
                sd[f"{b}.activations.{2 * m + 1}.act.alpha"] = w(ch)
                sd[f"{b}.activations.{2 * m + 1}.act.beta"] = w(ch)
    sd["activation_post.act.alpha"] = w(ch)
    sd["activation_post.act.beta"] = w(ch)
    sd["conv_post.weight"] = w(1, ch, 7)

    params = import_bigvgan_state_dict(sd, TINY)
    wav = bigvgan_forward(params, TINY, jnp.zeros((1, 8, 6)))
    assert wav.shape == (1, 1, 24)
    assert "bias" not in params["conv_post"]
    np.testing.assert_allclose(
        np.asarray(params["ups"][0]["weight"]),
        sd["ups.0.0.weight"], rtol=1e-6)


def test_nlc_layout_matches_ncl():
    """Channels-last forward is numerically the same computation."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from ditto_tts_tpu.core.config import VocoderConfig
    from ditto_tts_tpu.models.vocoder import bigvgan_forward, init_bigvgan

    cfg = VocoderConfig(
        num_mels=8, upsample_rates=(4, 4), upsample_kernel_sizes=(8, 8),
        upsample_initial_channel=16, resblock_kernel_sizes=(3, 7),
        resblock_dilation_sizes=((1, 3), (1, 3)),
        compute_dtype="float32", carry_dtype="float32")
    params = init_bigvgan(jax.random.key(0), cfg)
    # exercise nonzero snake params
    params = jax.tree_util.tree_map(
        lambda l: l + 0.1 if l.ndim == 1 else l, params)
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((2, 8, 37)), jnp.float32)
    ref = bigvgan_forward(params, cfg, mel, layout="ncl")
    for conv_impl in ("xla", "gemm"):
        nlc = bigvgan_forward(params, cfg.replace(conv_impl=conv_impl), mel,
                              layout="nlc")
        assert ref.shape == nlc.shape
        np.testing.assert_allclose(np.asarray(nlc), np.asarray(ref),
                                   rtol=2e-5, atol=2e-6,
                                   err_msg=f"conv_impl={conv_impl}")


def test_conv1d_nlc_gemm_matches_xla():
    """Tap-sum GEMM conv == lax conv (dilations, bias, bf16 compute)."""
    from ditto_tts_tpu.nn.conv import conv1d_nlc, conv1d_nlc_gemm

    rng = np.random.default_rng(1)
    for (cin, cout, k, d) in [(16, 8, 3, 1), (8, 16, 7, 3), (4, 4, 11, 5),
                              (8, 8, 1, 1)]:
        x = jnp.asarray(rng.standard_normal((2, 64, cin)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((cout, cin, k)),
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        ref = conv1d_nlc(x, w, b, dilation=d)
        got = conv1d_nlc_gemm(x, w, b, dilation=d)
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        refb = conv1d_nlc(x, w, None, dilation=d,
                          compute_dtype=jnp.bfloat16)
        gotb = conv1d_nlc_gemm(x, w, None, dilation=d,
                               compute_dtype=jnp.bfloat16)
        np.testing.assert_allclose(np.asarray(gotb), np.asarray(refb),
                                   rtol=2e-2, atol=2e-2)


def test_conv_transpose_poly_matches_dilated():
    """conv_transpose1d_poly == conv_transpose1d(_nlc) exactly (both
    layouts, BigVGAN + EnCodec (k=2r) geometries, with/without bias)."""
    from ditto_tts_tpu.nn.conv import (conv_transpose1d, conv_transpose1d_nlc,
                                       conv_transpose1d_poly)

    rng = np.random.default_rng(0)
    for (cin, cout, k, r) in [(16, 8, 8, 4), (8, 4, 4, 2), (6, 3, 16, 8),
                              (5, 7, 10, 5), (4, 4, 3, 1)]:
        x = jnp.asarray(rng.standard_normal((2, cin, 19)), jnp.float32)
        w = jnp.asarray(0.1 * rng.standard_normal((cin, cout, k)),
                        jnp.float32)
        b = jnp.asarray(rng.standard_normal((cout,)), jnp.float32)
        ref = conv_transpose1d(x, w, b, stride=r)
        got = conv_transpose1d_poly(x, w, b, stride=r, layout="ncl")
        assert got.shape == ref.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
        xl = x.transpose(0, 2, 1)
        refl = conv_transpose1d_nlc(xl, w, b, stride=r)
        gotl = conv_transpose1d_poly(xl, w, b, stride=r, layout="nlc")
        assert gotl.shape == refl.shape
        np.testing.assert_allclose(np.asarray(gotl), np.asarray(refl),
                                   rtol=1e-5, atol=1e-5)
