"""North-star test: OUR pipeline vs the ACTUAL reference implementation.

Unlike the per-module golden tests (which rebuild torch oracles inline),
this imports ``/root/reference/src`` and runs the reference's real serving
chain — ``SpeechGenerator.generate_speech_from_audio_tensor``
(ref: src/model/SpeechGenerator.py:93-164) — end to end, then replays the
same weights and the same torch noise stream through our jitted pipeline
and asserts stage-by-stage agreement through to the final waveform.

Uses a reduced-but-real configuration (2 DiT blocks, T=8, tiny BigVGAN
geometry) so the whole thing runs in ~1 min on the CPU mesh; the full
trained configuration (5L/1H, T=50, full 100-band BigVGAN) is exercised by
``scripts/parity_report.py`` (PARITY_r02.json).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ditto_tts_tpu.core.config import (DiTConfig, PipelineConfig,
                                       SamplerConfig, VocoderConfig)
from ditto_tts_tpu.eval import reference_harness as rh
from ditto_tts_tpu.infer.generator import build_synthesize_recorded
from ditto_tts_tpu.utils.torch_bridge import record_reference_noise

pytestmark = pytest.mark.skipif(not rh.reference_available(),
                                reason="/root/reference/src not present")

T = 8
SEED, RUN_SEED = 1234, 7

PCFG = PipelineConfig(
    dit=DiTConfig(num_layers=2, num_heads=1, diffusion_steps=T,
                  ref_compat=True, compute_dtype="float32"),
    vocoder=VocoderConfig(
        num_mels=8, upsample_rates=(8, 8, 4),
        upsample_kernel_sizes=(16, 16, 8), upsample_initial_channel=32,
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3), (1, 3)),
        compute_dtype="float32", carry_dtype="float32"),
    sampler=SamplerConfig(num_steps=T))


@pytest.fixture(scope="module")
def reference_run():
    rng = np.random.default_rng(RUN_SEED)
    audio = (0.1 * rng.standard_normal((1, 1, 12000))).astype(np.float32)
    mask = np.ones((1, 12000), np.int64)
    text_ids = rng.integers(0, 50257, (1, 24)).astype(np.int64)
    with rh.reference_session(PCFG, seed=SEED) as (gen, caps):
        wav = rh.run_reference(gen, audio, mask, text_ids, seed=RUN_SEED,
                               cond_by_audio=True)
        params = rh.export_generator_params(gen, PCFG)
    return dict(audio=audio, mask=mask, text_ids=text_ids, wav=wav,
                caps=caps, params=params)


@pytest.fixture(scope="module")
def our_run(reference_run):
    r = reference_run
    f = r["caps"]["q_in"].shape[1]
    noise = record_reference_noise((1, f, PCFG.dit.hidden_dim), T, RUN_SEED,
                                   cond_by_audio=True)
    fn = jax.jit(build_synthesize_recorded(PCFG, cond_by_audio=True))
    wav, inter = fn(r["params"], jnp.asarray(r["audio"]),
                    jnp.asarray(r["mask"]), jnp.asarray(r["text_ids"]),
                    jnp.asarray(noise["prompt_noise"]), None,
                    jnp.asarray(noise["step_noise"]))
    return np.asarray(wav), jax.tree_util.tree_map(np.asarray, inter)


def test_encoder_latents_bit_match(reference_run, our_run):
    # frozen-codec encode -> embedding head -> channel mean: same codes,
    # same table lookups => bit-identical
    np.testing.assert_array_equal(our_run[1]["latents"],
                                  reference_run["caps"]["q_in"])


def test_noised_prompt_matches(reference_run, our_run):
    np.testing.assert_allclose(our_run[1]["noised"],
                               reference_run["caps"]["q_out"],
                               rtol=1e-5, atol=1e-6)


def test_refined_latents_match(reference_run, our_run):
    want = reference_run["caps"]["vq_in"][:, 0]
    got = our_run[1]["refined"]
    scale = np.abs(want).max()
    np.testing.assert_allclose(got / scale, want / scale,
                               rtol=0, atol=1e-5)


def test_vq_indices_identical(reference_run, our_run):
    np.testing.assert_array_equal(our_run[1]["indices"],
                                  reference_run["caps"]["vq_idx"])


def test_mel_matches(reference_run, our_run):
    mel_mae = np.abs(our_run[1]["mel"]
                     - reference_run["caps"]["mel"]).mean()
    assert mel_mae < 1e-4, mel_mae


def test_final_waveform_allclose(reference_run, our_run):
    want = reference_run["caps"]["wav"][:, 0]
    got = our_run[0]
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)
    assert np.abs(got - want).mean() < 1e-5


def test_reference_entrypoint_output_equals_capture(reference_run):
    # the value returned by generate_speech_from_audio_tensor IS the
    # vocoder output (ref: SpeechGenerator.py:126-128)
    np.testing.assert_array_equal(reference_run["wav"],
                                  reference_run["caps"]["wav"][0])
