"""Config serde + derived-value tests."""

import json

from ditto_tts_tpu.core.config import (AudioConfig, CodecConfig, DiTConfig,
                                       MeshConfig, PipelineConfig,
                                       SamplerConfig,
                                       ref_trained_dit_config)


def test_dit_config_json_roundtrip():
    cfg = DiTConfig(num_layers=5, num_heads=1, ref_compat=True)
    back = DiTConfig.from_json(cfg.to_json())
    assert back == cfg
    assert back.head_dim == 768


def test_pipeline_config_roundtrip_nested():
    cfg = PipelineConfig(dit=DiTConfig(num_layers=3),
                         sampler=SamplerConfig(num_steps=25, kind="ddim"))
    back = PipelineConfig.from_json(cfg.to_json())
    assert back.dit.num_layers == 3
    assert back.sampler.kind == "ddim"
    assert back.codec.ratios == (8, 5, 4, 2)
    assert isinstance(back.vocoder.resblock_dilation_sizes[0], tuple)


def test_codec_derived():
    assert CodecConfig().hop_length == 320
    assert AudioConfig().max_latent_frames == 1500


def test_ref_trained_config_matches_reference():
    """ref Config.py:109-116: hidden 768, 5 layers, 1 head, T=1000."""
    cfg = ref_trained_dit_config()
    assert (cfg.hidden_dim, cfg.num_layers, cfg.num_heads) == (768, 5, 1)
    assert cfg.diffusion_steps == 1000
    assert cfg.ref_compat


def test_mesh_config():
    m = MeshConfig(data=4, model=2)
    assert m.axis_names == ("data", "model")
    d = json.loads(m.to_json())
    assert d["data"] == 4
