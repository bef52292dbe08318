"""Multi-layer LSTM with torch semantics, as a ``lax.scan`` over time.

Needed for the EnCodec bottleneck (HF EncodecLSTM: 2-layer LSTM + residual).
Weight layout per layer matches torch.nn.LSTM: ``weight_ih_l{k}`` [4H, in],
``weight_hh_l{k}`` [4H, H], biases [4H], gate order (i, f, g, o).

TPU notes: the recurrence is inherently sequential, so the scan body is one
fused step: both gate matmuls for the whole batch hit the MXU, elementwise
gates fuse on the VPU. The input-to-hidden projection for ALL timesteps is
hoisted out of the scan (one big [T*B, in] x [in, 4H] matmul) so the serial
part only carries the [B, H] recurrent matmul.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def lstm_layer(params, x):
    """One LSTM layer. x: [T, B, in] -> [T, B, H] (torch seq-first layout)."""
    w_ih = params["weight_ih"]    # [4H, in]
    w_hh = params["weight_hh"]    # [4H, H]
    b = params["bias_ih"] + params["bias_hh"]   # [4H]
    hidden = w_hh.shape[1]

    # Hoist the input projection out of the recurrence: [T, B, 4H]
    x_proj = jnp.einsum("tbi,gi->tbg", x, w_ih,
                        preferred_element_type=jnp.float32).astype(x.dtype) + b

    def step(carry, xp):
        h, c = carry
        gates = xp + jnp.einsum(
            "bh,gh->bg", h, w_hh,
            preferred_element_type=jnp.float32).astype(h.dtype)
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        i = jax.nn.sigmoid(i)
        f = jax.nn.sigmoid(f)
        g = jnp.tanh(g)
        o = jax.nn.sigmoid(o)
        c = f * c + i * g
        h = o * jnp.tanh(c)
        return (h, c), h

    batch = x.shape[1]
    h0 = jnp.zeros((batch, hidden), x.dtype)
    c0 = jnp.zeros((batch, hidden), x.dtype)
    # unroll: the [B, H] recurrent matmul is tiny, so per-iteration loop
    # overhead dominates the serial bottleneck; 8 steps per loop trip
    # amortize it without a visible compile-time cost at T<=1500
    _, ys = jax.lax.scan(step, (h0, c0), x_proj, unroll=8)
    return ys


def lstm(params_layers, x):
    """Stacked LSTM. x: [T, B, in] -> [T, B, H]."""
    for p in params_layers:
        x = lstm_layer(p, x)
    return x


def init_lstm(key, input_size, hidden_size, num_layers, dtype=jnp.float32):
    import math
    layers = []
    std = 1.0 / math.sqrt(hidden_size)
    for i in range(num_layers):
        in_sz = input_size if i == 0 else hidden_size
        key, *ks = jax.random.split(key, 5)
        layers.append({
            "weight_ih": jax.random.uniform(ks[0], (4 * hidden_size, in_sz),
                                            dtype, -std, std),
            "weight_hh": jax.random.uniform(ks[1], (4 * hidden_size,
                                                    hidden_size),
                                            dtype, -std, std),
            "bias_ih": jax.random.uniform(ks[2], (4 * hidden_size,),
                                          dtype, -std, std),
            "bias_hh": jax.random.uniform(ks[3], (4 * hidden_size,),
                                          dtype, -std, std),
        })
    return layers
