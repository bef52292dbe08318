"""Conv1d / ConvTranspose1d / LSTM golden tests vs torch."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ditto_tts_tpu.nn.conv import (causal_conv1d, conv1d, conv_transpose1d,
                                   pad1d)
from ditto_tts_tpu.nn.lstm import lstm


def test_conv1d_matches_torch():
    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 3, 20)).astype(np.float32)
    w = rng.standard_normal((5, 3, 4)).astype(np.float32)
    b = rng.standard_normal((5,)).astype(np.float32)
    want = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=2, dilation=1).numpy()
    got = conv1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b), stride=2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_conv1d_dilated_matches_torch():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 2, 30)).astype(np.float32)
    w = rng.standard_normal((4, 2, 3)).astype(np.float32)
    want = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), dilation=3).numpy()
    got = conv1d(jnp.asarray(x), jnp.asarray(w), dilation=3)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_conv_transpose1d_matches_torch():
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 11)).astype(np.float32)
    w = rng.standard_normal((3, 6, 8)).astype(np.float32)
    b = rng.standard_normal((6,)).astype(np.float32)
    want = torch.nn.functional.conv_transpose1d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=4).numpy()
    got = conv_transpose1d(jnp.asarray(x), jnp.asarray(w), jnp.asarray(b),
                           stride=4)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)


def test_reflect_pad_matches_torch():
    x = np.arange(10, dtype=np.float32).reshape(1, 1, 10)
    want = torch.nn.functional.pad(torch.from_numpy(x), (3, 2),
                                   mode="reflect").numpy()
    got = pad1d(jnp.asarray(x), (3, 2), mode="reflect")
    np.testing.assert_array_equal(np.asarray(got), want)


def test_causal_conv_output_length():
    # stride s, kernel k: causal conv must produce ceil(L/s) frames
    x = jnp.zeros((1, 1, 24000))
    w = jnp.zeros((4, 1, 7))
    y = causal_conv1d(x, w, stride=2)
    assert y.shape[-1] == 12000


def test_lstm_matches_torch():
    rng = np.random.default_rng(3)
    T, B, I, H, L = 12, 2, 6, 8, 2
    x = rng.standard_normal((T, B, I)).astype(np.float32)
    ref = torch.nn.LSTM(I, H, L)
    with torch.no_grad():
        want = ref(torch.from_numpy(x))[0].numpy()
    params = []
    for i in range(L):
        params.append({
            "weight_ih": jnp.asarray(
                getattr(ref, f"weight_ih_l{i}").detach().numpy()),
            "weight_hh": jnp.asarray(
                getattr(ref, f"weight_hh_l{i}").detach().numpy()),
            "bias_ih": jnp.asarray(
                getattr(ref, f"bias_ih_l{i}").detach().numpy()),
            "bias_hh": jnp.asarray(
                getattr(ref, f"bias_hh_l{i}").detach().numpy()),
        })
    got = lstm(params, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
