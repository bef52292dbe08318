"""Primitive-level golden tests vs torch CPU semantics."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ditto_tts_tpu.nn.core import (Embedding, LayerNorm, Linear, count_params,
                                   dense, embed, layer_norm)


def test_dense_matches_torch_linear():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((16, 8), dtype=np.float32)
    b = rng.standard_normal((16,), dtype=np.float32)
    x = rng.standard_normal((4, 7, 8), dtype=np.float32)

    lin = torch.nn.Linear(8, 16)
    with torch.no_grad():
        lin.weight.copy_(torch.from_numpy(w))
        lin.bias.copy_(torch.from_numpy(b))
    want = lin(torch.from_numpy(x)).detach().numpy()

    got = dense({"weight": jnp.asarray(w), "bias": jnp.asarray(b)},
                jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("affine", [True, False])
def test_layer_norm_matches_torch(affine):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((3, 5, 32), dtype=np.float32) * 3 + 1
    ln = torch.nn.LayerNorm(32, elementwise_affine=affine)
    params = {}
    if affine:
        g = rng.standard_normal((32,), dtype=np.float32)
        bta = rng.standard_normal((32,), dtype=np.float32)
        with torch.no_grad():
            ln.weight.copy_(torch.from_numpy(g))
            ln.bias.copy_(torch.from_numpy(bta))
        params = {"weight": jnp.asarray(g), "bias": jnp.asarray(bta)}
    want = ln(torch.from_numpy(x)).detach().numpy()
    got = layer_norm(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_gelu_exact_matches_torch():
    x = np.linspace(-4, 4, 101, dtype=np.float32)
    want = torch.nn.functional.gelu(torch.from_numpy(x)).numpy()
    got = jax.nn.gelu(jnp.asarray(x), approximate=False)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6, atol=1e-6)


def test_embedding_lookup():
    emb = Embedding(10, 4)
    p = emb.init(jax.random.key(0))
    ids = jnp.array([[1, 2], [9, 0]])
    out = embed(p, ids)
    assert out.shape == (2, 2, 4)
    np.testing.assert_array_equal(np.asarray(out[0, 0]),
                                  np.asarray(p["weight"][1]))


def test_linear_init_shapes_and_count():
    lin = Linear(8, 16)
    p = lin.init(jax.random.key(0))
    assert p["weight"].shape == (16, 8)
    assert p["bias"].shape == (16,)
    assert count_params(p) == 16 * 8 + 16
