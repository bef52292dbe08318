"""End-to-end DiTTO forward parity vs a torch oracle.

The oracle composes stock torch modules (MultiheadAttention, LayerNorm,
Linear) into the reference architecture's exact semantics — including quirk
#2 (self-attention output projection skipped) and shared GlobalAdaLN — then
weights are copied into the JAX param pytree and outputs compared.
"""

import math

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ditto_tts_tpu.core.config import DiTConfig
from ditto_tts_tpu.models.dit import ditto_forward, init_ditto

# text_dim == hidden_dim as in the reference (both 768, Config.py:109,113);
# torch MHA cross-attention requires it.
CFG = DiTConfig(hidden_dim=16, num_layers=2, num_heads=2, time_dim=8,
                text_dim=16, diffusion_steps=10, cross_attn_dropout=0.1,
                ref_compat=True)


class _OracleBlock(torch.nn.Module):
    def __init__(self, h, heads):
        super().__init__()
        self.heads = heads
        self.norm1 = torch.nn.LayerNorm(h)
        self.attn = torch.nn.MultiheadAttention(h, heads)
        self.norm2 = torch.nn.LayerNorm(h)
        self.cross = torch.nn.MultiheadAttention(h, heads, dropout=0.1)
        self.norm3 = torch.nn.LayerNorm(h)
        self.fc1 = torch.nn.Linear(h, 4 * h)
        self.gate = torch.nn.Linear(h, 4 * h)
        self.fc2 = torch.nn.Linear(4 * h, h)

    def forward(self, x, text, cos, sin):
        b, s, h = x.shape
        d = h // self.heads
        res = x
        xn = self.norm1(x)
        w, bias = self.attn.in_proj_weight, self.attn.in_proj_bias
        q = torch.nn.functional.linear(xn, w[:h], bias[:h])
        k = torch.nn.functional.linear(xn, w[h:2 * h], bias[h:2 * h])
        v = torch.nn.functional.linear(xn, w[2 * h:], bias[2 * h:])
        q = q.view(b, s, self.heads, d)
        k = k.view(b, s, self.heads, d)

        def rope(t):
            half = d // 2
            rot = torch.cat([-t[..., half:], t[..., :half]], dim=-1)
            return t * cos[None, :, None, :] + rot * sin[None, :, None, :]

        q, k = rope(q).permute(0, 2, 1, 3), rope(k).permute(0, 2, 1, 3)
        v = v.view(b, s, self.heads, d).permute(0, 2, 1, 3)
        scores = q @ k.transpose(-2, -1) / math.sqrt(d)
        out = torch.softmax(scores, -1) @ v
        out = out.permute(0, 2, 1, 3).reshape(b, s, h)
        x = out + res  # no out_proj (quirk #2)

        res = x
        xn = self.norm2(x)
        x = self.cross(xn.transpose(0, 1), text.transpose(0, 1),
                       text.transpose(0, 1))[0].transpose(0, 1) + res

        res = x
        xn = self.norm3(x)
        return self.fc2(torch.nn.functional.gelu(self.fc1(xn))
                        * torch.sigmoid(self.gate(xn))) + res


class _OracleDiTTO(torch.nn.Module):
    def __init__(self, cfg: DiTConfig):
        super().__init__()
        h = cfg.hidden_dim
        self.cfg = cfg
        self.t_emb = torch.nn.Embedding(cfg.diffusion_steps, cfg.time_dim)
        self.tmlp1 = torch.nn.Linear(cfg.time_dim, cfg.time_dim)
        self.tmlp2 = torch.nn.Linear(cfg.time_dim, cfg.time_dim)
        self.ada_time = torch.nn.Linear(cfg.time_dim, 2 * h)
        self.ada_text = torch.nn.Linear(cfg.text_dim, 2 * h)
        self.ada_norm = torch.nn.LayerNorm(h, elementwise_affine=False)
        self.proj_in = torch.nn.Linear(h, h)
        self.proj_out = torch.nn.Linear(h, h)
        self.blocks = torch.nn.ModuleList(
            [_OracleBlock(h, cfg.num_heads) for _ in range(cfg.num_layers)])

    def forward(self, x, text, t):
        cfg = self.cfg
        temb = self.t_emb(t)
        temb = self.tmlp2(torch.nn.functional.silu(self.tmlp1(temb)))

        s, d = x.shape[1], cfg.head_dim
        inv = 1.0 / (10000 ** (torch.arange(0, d, 2).float() / d))
        fr = torch.arange(s).float()[:, None] * inv[None, :]
        pos = torch.cat([fr, fr], -1)
        cos, sin = pos.cos(), pos.sin()

        skip = self.proj_in(x)
        ts, tsh = self.ada_time(
            torch.nn.functional.silu(temb)).chunk(2, -1)
        xs, xsh = self.ada_text(
            torch.nn.functional.silu(text.mean(1))).chunk(2, -1)
        x = self.ada_norm(x) * (1 + ts + xs).unsqueeze(1) \
            + (tsh + xsh).unsqueeze(1)
        for blk in self.blocks:
            x = blk(x, text, cos, sin)
        return skip + self.proj_out(x)


def _torch_to_params(oracle: _OracleDiTTO):
    def t2j(t):
        return jnp.asarray(t.detach().numpy())

    def lin(m):
        return {"weight": t2j(m.weight), "bias": t2j(m.bias)}

    def mha(m):
        return {"in_proj_weight": t2j(m.in_proj_weight),
                "in_proj_bias": t2j(m.in_proj_bias),
                "out_proj": lin(m.out_proj)}

    blocks = []
    for b in oracle.blocks:
        blocks.append({
            "norm1": lin(b.norm1), "attn": mha(b.attn),
            "norm2": lin(b.norm2), "cross_attn": mha(b.cross),
            "norm3": lin(b.norm3), "mlp_fc1": lin(b.fc1),
            "gate": lin(b.gate), "mlp_fc2": lin(b.fc2),
        })
    return {
        "t_embedding": {"weight": t2j(oracle.t_emb.weight)},
        "time_embed": {"fc1": lin(oracle.tmlp1), "fc2": lin(oracle.tmlp2)},
        "ada_ln": {"time_mlp": lin(oracle.ada_time),
                   "text_mlp": lin(oracle.ada_text)},
        "proj_in": lin(oracle.proj_in),
        "proj_out": lin(oracle.proj_out),
        "blocks": blocks,
    }


def test_ditto_forward_matches_torch_oracle():
    torch.manual_seed(0)
    oracle = _OracleDiTTO(CFG).eval()
    params = _torch_to_params(oracle)

    rng = np.random.default_rng(0)
    x = rng.standard_normal((2, 6, CFG.hidden_dim)).astype(np.float32)
    text = rng.standard_normal((2, 5, CFG.text_dim)).astype(np.float32)
    t = np.array([3, 7], np.int64)

    with torch.no_grad():
        want = oracle(torch.from_numpy(x), torch.from_numpy(text),
                      torch.from_numpy(t)).numpy()
    got = ditto_forward(params, CFG, jnp.asarray(x), jnp.asarray(text),
                        jnp.asarray(t, jnp.int32))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-5)


def test_ditto_init_and_jit():
    params = init_ditto(jax.random.key(0), CFG)
    fwd = jax.jit(lambda p, x, te, t: ditto_forward(p, CFG, x, te, t))
    x = jnp.ones((1, 4, CFG.hidden_dim))
    te = jnp.ones((1, 3, CFG.text_dim))
    out = fwd(params, x, te, jnp.array([0], jnp.int32))
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()


def test_out_proj_used_when_not_ref_compat():
    cfg = CFG.replace(ref_compat=False)
    params = init_ditto(jax.random.key(1), cfg)
    x = jnp.ones((1, 4, cfg.hidden_dim))
    te = jnp.ones((1, 3, cfg.text_dim))
    t = jnp.array([0], jnp.int32)
    a = ditto_forward(params, cfg, x, te, t)
    b = ditto_forward(params, CFG, x, te, t)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_scan_blocks_matches_loop():
    cfg4 = CFG.replace(num_layers=3, ref_compat=False)
    params = init_ditto(jax.random.key(5), cfg4)
    x = jnp.asarray(np.random.default_rng(6)
                    .standard_normal((2, 7, CFG.hidden_dim)).astype(np.float32))
    te = jnp.asarray(np.random.default_rng(7)
                     .standard_normal((2, 4, CFG.text_dim)).astype(np.float32))
    t = jnp.array([1, 8], jnp.int32)
    a = ditto_forward(params, cfg4, x, te, t)
    b = ditto_forward(params, cfg4.replace(scan_blocks=True), x, te, t)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                               rtol=1e-5, atol=1e-6)


def test_scan_blocks_with_dropout_deterministic():
    cfg4 = CFG.replace(num_layers=2, ref_compat=False, scan_blocks=True)
    params = init_ditto(jax.random.key(5), cfg4)
    x = jnp.ones((1, 5, CFG.hidden_dim))
    te = jnp.ones((1, 3, CFG.text_dim))
    t = jnp.array([0], jnp.int32)
    k = jax.random.key(9)
    a = ditto_forward(params, cfg4, x, te, t, dropout_key=k)
    b = ditto_forward(params, cfg4, x, te, t, dropout_key=k)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_bf16_compute_close_to_fp32():
    cfg = CFG.replace(ref_compat=False, compute_dtype="bfloat16")
    params = init_ditto(jax.random.key(11), cfg)
    x = jnp.asarray(np.random.default_rng(12)
                    .standard_normal((1, 8, CFG.hidden_dim)).astype(np.float32))
    te = jnp.asarray(np.random.default_rng(13)
                     .standard_normal((1, 4, CFG.text_dim)).astype(np.float32))
    t = jnp.array([2], jnp.int32)
    lo = ditto_forward(params, cfg, x, te, t)
    hi = ditto_forward(params, cfg.replace(compute_dtype="float32"),
                       x, te, t)
    assert lo.dtype == jnp.float32  # output cast back
    err = np.abs(np.asarray(lo) - np.asarray(hi))
    scale = np.abs(np.asarray(hi)).std()
    assert err.max() < 0.1 * scale + 0.02, (err.max(), scale)


def test_remat_identical_forward_and_grads():
    cfg = CFG.replace(ref_compat=False)
    cfg_r = cfg.replace(remat_blocks=True)
    params = init_ditto(jax.random.key(14), cfg)
    x = jnp.asarray(np.random.default_rng(15)
                    .standard_normal((1, 6, CFG.hidden_dim)).astype(np.float32))
    te = jnp.ones((1, 3, CFG.text_dim))
    t = jnp.array([1], jnp.int32)

    def loss(p, c):
        return jnp.sum(ditto_forward(p, c, x, te, t) ** 2)

    np.testing.assert_allclose(float(loss(params, cfg)),
                               float(loss(params, cfg_r)), rtol=1e-6)
    g_a = jax.grad(lambda p: loss(p, cfg))(params)
    g_b = jax.grad(lambda p: loss(p, cfg_r))(params)
    for a, b in zip(jax.tree_util.tree_leaves(g_a),
                    jax.tree_util.tree_leaves(g_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


def test_prepared_blocks_match_unprepared():
    """prepare_blocks (stack + cast + fc1/gate fusion outside the scan)
    must be bit-identical to the in-forward stacking path."""
    from ditto_tts_tpu.models.dit import prepare_blocks

    for cdtype in ("float32", "bfloat16"):
        cfg = DiTConfig(hidden_dim=64, num_layers=3, num_heads=4,
                        time_dim=32, text_dim=64, scan_blocks=True,
                        compute_dtype=cdtype)
        params = init_ditto(jax.random.key(0), cfg)
        rng = np.random.default_rng(5)
        x = jnp.asarray(rng.standard_normal((2, 12, 64)), jnp.float32)
        te = jnp.asarray(rng.standard_normal((2, 7, 64)), jnp.float32)
        t = jnp.asarray([3, 9], jnp.int32)
        want = np.asarray(ditto_forward(params, cfg, x, te, t))
        prep = prepare_blocks(params, cfg)
        got = np.asarray(ditto_forward(params, cfg, x, te, t,
                                       prepared_blocks=prep))
        np.testing.assert_array_equal(got, want)
