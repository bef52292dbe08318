"""Mesh/sharding tests on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ditto_tts_tpu.core.config import DiTConfig, MeshConfig
from ditto_tts_tpu.models import dit as dit_mod
from ditto_tts_tpu.parallel import mesh as mesh_mod
from ditto_tts_tpu.parallel import sharding as shard_mod

DIT_CFG = DiTConfig(hidden_dim=16, num_layers=2, num_heads=2, time_dim=8,
                    text_dim=16, diffusion_steps=10)


def test_make_mesh_shapes(devices8):
    mesh = mesh_mod.make_mesh(MeshConfig(data=4, model=2), devices8)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    mesh = mesh_mod.auto_mesh(2, devices8)
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        mesh_mod.make_mesh(MeshConfig(data=16, model=2), devices8)


def test_dit_param_specs_rules():
    params = dit_mod.init_ditto(jax.random.key(0), DIT_CFG)
    specs = shard_mod.dit_param_specs(params)
    blk = specs["blocks"][0]
    assert blk["attn"]["in_proj_weight"] == P("model", None)
    assert blk["attn"]["out_proj"]["weight"] == P(None, "model")
    assert blk["mlp_fc1"]["weight"] == P("model", None)
    assert blk["mlp_fc2"]["weight"] == P(None, "model")
    assert blk["norm1"]["weight"] == P()
    assert specs["proj_in"]["weight"] == P()
    assert specs["t_embedding"]["weight"] == P()


def test_sharded_forward_matches_replicated(devices8):
    """DiT forward under 2-way TP x 4-way DP == single-device forward."""
    mesh = mesh_mod.make_mesh(MeshConfig(data=4, model=2), devices8)
    params = dit_mod.init_ditto(jax.random.key(0), DIT_CFG)
    x = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((8, 6, 16)).astype(np.float32))
    text = jnp.asarray(np.random.default_rng(1)
                       .standard_normal((8, 5, 16)).astype(np.float32))
    t = jnp.zeros((8,), jnp.int32)

    want = dit_mod.ditto_forward(params, DIT_CFG, x, text, t)

    specs = shard_mod.dit_param_specs(params)
    params_sh = shard_mod.shard_tree(mesh, params, specs)
    xs = jax.device_put(x, NamedSharding(mesh, P("data")))
    ts = jax.device_put(text, NamedSharding(mesh, P("data")))
    tt = jax.device_put(t, NamedSharding(mesh, P("data")))

    with jax.set_mesh(mesh):
        got = jax.jit(
            lambda p, a, b, c: dit_mod.ditto_forward(p, DIT_CFG, a, b, c)
        )(params_sh, xs, ts, tt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_graft_entry_single():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == args[1].shape


def test_graft_entry_multichip(devices8):
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


def test_scaling_bench_runs(devices8, capsys):
    import runpy
    import sys
    argv = sys.argv
    sys.argv = ["scaling_bench.py", "--tiny", "--devices", "1", "2",
                "--iters", "1"]
    try:
        runpy.run_path("scripts/scaling_bench.py", run_name="__main__")
    finally:
        sys.argv = argv
    out = capsys.readouterr().out.strip().split("\n")
    import json
    recs = [json.loads(l) for l in out if l.startswith("{")]
    assert len(recs) == 2
    assert recs[0]["devices"] == 1 and recs[1]["devices"] == 2
    assert recs[0]["weak_scaling_efficiency"] == 1.0
