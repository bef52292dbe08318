"""RoPE golden tests: formula oracle in numpy (ref semantics, DiT.py:43-72)."""

import numpy as np
import jax.numpy as jnp

from ditto_tts_tpu.ops.rope import apply_rope, rope_tables, rotate_half


def _oracle_tables(seq, dim):
    inv_freq = 1.0 / (10000.0 ** (np.arange(0, dim, 2, dtype=np.float64) / dim))
    freqs = np.arange(seq, dtype=np.float64)[:, None] * inv_freq[None, :]
    pos = np.concatenate([freqs, freqs], axis=-1)
    return np.cos(pos), np.sin(pos)


def test_tables_match_formula():
    cos, sin = rope_tables(17, 32)
    oc, osin = _oracle_tables(17, 32)
    np.testing.assert_allclose(np.asarray(cos), oc, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(sin), osin, rtol=1e-5, atol=1e-6)


def test_rotate_half():
    x = jnp.arange(8.0).reshape(1, 8)
    out = np.asarray(rotate_half(x))
    np.testing.assert_array_equal(out[0], [-4, -5, -6, -7, 0, 1, 2, 3])


def test_apply_rope_oracle():
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 9, 3, 16), dtype=np.float32)  # [B,S,H,D]
    cos, sin = rope_tables(9, 16)
    got = np.asarray(apply_rope(jnp.asarray(x), cos, sin))

    oc, osin = _oracle_tables(9, 16)
    half = 8
    rot = np.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    want = (x * oc[None, :, None, :] + rot * osin[None, :, None, :])
    np.testing.assert_allclose(got, want.astype(np.float32),
                               rtol=1e-5, atol=1e-5)


def test_rope_preserves_norm():
    # rotation preserves 2-norm of each (pair) subspace
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 12, 1, 64), dtype=np.float32)
    cos, sin = rope_tables(12, 64)
    y = np.asarray(apply_rope(jnp.asarray(x), cos, sin))
    np.testing.assert_allclose(np.linalg.norm(y, axis=-1),
                               np.linalg.norm(x, axis=-1),
                               rtol=1e-4)
