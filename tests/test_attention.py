"""Attention: Pallas kernel (interpret mode on CPU) vs jnp reference,
and jnp reference vs torch SDPA."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ditto_tts_tpu.ops.attention import pallas_attention, sdpa_reference

torch = pytest.importorskip("torch")


def _rand(shape, seed):
    return np.random.default_rng(seed).standard_normal(shape).astype(np.float32)


def test_sdpa_matches_torch():
    q = _rand((2, 3, 10, 16), 0)
    k = _rand((2, 3, 14, 16), 1)
    v = _rand((2, 3, 14, 16), 2)
    want = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v)).numpy()
    got = sdpa_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_sdpa_causal_matches_torch():
    q = _rand((1, 2, 12, 8), 3)
    k = _rand((1, 2, 12, 8), 4)
    v = _rand((1, 2, 12, 8), 5)
    want = torch.nn.functional.scaled_dot_product_attention(
        torch.from_numpy(q), torch.from_numpy(k), torch.from_numpy(v),
        is_causal=True).numpy()
    got = sdpa_reference(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                         causal=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("shape", [
    # (B, H, Sq, Sk, D) — including non-tile-aligned sizes
    (1, 1, 128, 128, 64),
    (2, 3, 100, 77, 64),
    (1, 2, 260, 300, 48),
])
@pytest.mark.parametrize("causal", [False, True])
def test_pallas_attention_matches_reference(shape, causal):
    b, h, sq, sk, d = shape
    if causal and sq != sk:
        pytest.skip("causal only for square attention")
    q = jnp.asarray(_rand((b, h, sq, d), 10))
    k = jnp.asarray(_rand((b, h, sk, d), 11))
    v = jnp.asarray(_rand((b, h, sk, d), 12))
    want = sdpa_reference(q, k, v, causal=causal)
    got = pallas_attention(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_pallas_attention_block_boundary():
    # Sq smaller than one block
    q = jnp.asarray(_rand((1, 1, 5, 32), 20))
    k = jnp.asarray(_rand((1, 1, 9, 32), 21))
    v = jnp.asarray(_rand((1, 1, 9, 32), 22))
    want = sdpa_reference(q, k, v)
    got = pallas_attention(q, k, v, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


@pytest.mark.parametrize("shape", [
    # (B, H, Sq, Sk, D) — D=64 packs 2 heads, D=32 packs 4; odd H falls back
    (2, 4, 100, 100, 64),
    (1, 12, 260, 260, 64),
    (2, 4, 50, 50, 32),
    (1, 3, 40, 40, 64),
])
@pytest.mark.parametrize("causal", [False, True])
def test_pallas_packed_matches_reference(shape, causal):
    from ditto_tts_tpu.ops.attention import pallas_attention_packed
    b, h, sq, sk, d = shape
    q = jnp.asarray(_rand((b, h, sq, d), 10))
    k = jnp.asarray(_rand((b, h, sk, d), 11))
    v = jnp.asarray(_rand((b, h, sk, d), 12))
    want = sdpa_reference(q, k, v, causal=causal)
    got = pallas_attention_packed(q, k, v, causal=causal, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-4, atol=1e-5)


def test_pallas_attention_gradient_matches_sdpa():
    """The custom-VJP wrapper (Pallas fwd, standard bwd) must produce the
    same gradients as differentiating the XLA SDPA reference."""
    from jax.experimental.pallas import tpu as pltpu

    from ditto_tts_tpu.ops.attention import (_pallas_attention_diff,
                                             sdpa_reference)

    rng = np.random.default_rng(3)
    b, h, s, d = 1, 4, 40, 64   # h*d packs 2 heads per 128 lanes
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
               for _ in range(3))

    def loss_pallas(q, k, v):
        return jnp.sum(jnp.sin(_pallas_attention_diff(q, k, v, False, None)))

    def loss_ref(q, k, v):
        return jnp.sum(jnp.sin(sdpa_reference(q, k, v)))

    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_),
                                   rtol=2e-4, atol=2e-5)


def test_pallas_attention_gradient_causal():
    from jax.experimental.pallas import tpu as pltpu

    from ditto_tts_tpu.ops.attention import (_pallas_attention_diff,
                                             sdpa_reference)

    rng = np.random.default_rng(4)
    b, h, s, d = 1, 2, 24, 64
    q, k, v = (jnp.asarray(rng.standard_normal((b, h, s, d)), jnp.float32)
               for _ in range(3))
    with pltpu.force_tpu_interpret_mode():
        gp = jax.grad(lambda q: jnp.sum(
            _pallas_attention_diff(q, k, v, True, None) ** 2))(q)
    gr = jax.grad(lambda q: jnp.sum(
        sdpa_reference(q, k, v, causal=True) ** 2))(q)
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gr),
                               rtol=2e-4, atol=2e-5)
