"""Parity/oracle tests for capability-parity components outside the active
path: ResBlock1/2 (modules.py:221,318), LoRA layers (unet1d/lora.py),
DualTransformer1D (dual_transformer_1d.py), ConvAttentionLayer
(operations.py:905), repeat_expand_2d (utils.py:482)."""
import numpy as np
import pytest

from tests.conftest import reference_available, add_reference_to_path

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)
add_reference_to_path()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diff_vits_tpu.nn import fairseq as fs  # noqa: E402
from diff_vits_tpu.nn import layers as L  # noqa: E402
from diff_vits_tpu.nn import lora as lora_lib  # noqa: E402
from diff_vits_tpu.nn import unet1d as U  # noqa: E402
from diff_vits_tpu.utils import transplant as tp  # noqa: E402

torch.manual_seed(0)


def bct(x_btc):
    return torch.tensor(np.asarray(x_btc)).transpose(1, 2)


def to_btc(t):
    return t.detach().numpy().transpose(0, 2, 1)


@pytest.mark.parametrize("which", ["1", "2"])
def test_resblock_parity(which):
    import modules as ref_modules
    c, k = 8, 3
    if which == "1":
        ref = ref_modules.ResBlock1(c, k, (1, 3, 5)).eval()
        model = L.ResBlock1(c, k, (1, 3, 5))
    else:
        ref = ref_modules.ResBlock2(c, k, (1, 3)).eval()
        model = L.ResBlock2(c, k, (1, 3))
    state = ref.state_dict()

    rng = np.random.default_rng(0)
    b, t = 2, 17
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(bct(x))

    if which == "1":
        params = {}
        for i in range(3):
            params[f"conv1_{i}"] = tp.conv1d(state, f"convs1.{i}")
            params[f"conv2_{i}"] = tp.conv1d(state, f"convs2.{i}")
    else:
        params = {f"conv_{i}": tp.conv1d(state, f"convs.{i}")
                  for i in range(2)}
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), to_btc(out_ref), atol=1e-4)


def test_lora_linear_parity():
    import unet1d.lora as ref_lora
    cin, cout, rank = 8, 6, 3
    ref = ref_lora.LoRALinearLayer(cin, cout, rank, network_alpha=2.0).eval()
    with torch.no_grad():  # up is zero-init; randomize to exercise
        ref.up.weight.normal_()
    state = ref.state_dict()

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 5, cin)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x))

    model = lora_lib.LoRALinearLayer(cout, rank, network_alpha=2.0)
    params = {"down": {"kernel": state["down.weight"].numpy().T},
              "up": {"kernel": state["up.weight"].numpy().T}}
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref.numpy(), atol=1e-5)


def test_lora_compatible_dense_zero_start():
    """rank>0 with fresh init must equal the base layer (up is zero-init)."""
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(2, 5, 8)), jnp.float32)
    base = lora_lib.LoRACompatibleDense(6, rank=0)
    adapted = lora_lib.LoRACompatibleDense(6, rank=2)
    pb = base.init(jax.random.PRNGKey(0), x)
    pa = adapted.init(jax.random.PRNGKey(0), x)
    np.testing.assert_allclose(
        np.asarray(base.apply(pb, x)),
        np.asarray(adapted.apply(pa, x)), atol=1e-6)


def test_dual_transformer_smoke():
    b, t, c, heads, hd = 2, 12, 32, 2, 16
    cl = (3, 4)
    model = U.DualTransformer1D(c, heads, hd, cross_attention_dim=16,
                                condition_lengths=cl)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, sum(cl), 16)), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x, ctx)
    out = model.apply(params, x, ctx)
    assert out.shape == x.shape
    assert np.isfinite(np.asarray(out)).all()
    # mix_ratio=1 uses only transformer[index_for_condition[0]]'s delta
    m1 = U.DualTransformer1D(c, heads, hd, cross_attention_dim=16,
                             condition_lengths=cl, mix_ratio=1.0)
    out1 = m1.apply(params, x, ctx)
    assert not np.allclose(np.asarray(out), np.asarray(out1))


def test_conv_attention_layer_parity():
    import operations as ref_ops
    c, hidden = 8, 8  # value dim must equal hidden (reference contract)
    ref = ref_ops.ConvAttentionLayer(c, hidden, dropout=0.0).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(4)
    b, tq, tk = 2, 7, 9
    x = rng.normal(size=(tq, b, c)).astype(np.float32)
    key = rng.normal(size=(tk, b, hidden)).astype(np.float32)
    value = rng.normal(size=(tk, b, hidden)).astype(np.float32)
    pad = np.zeros((b, tk), bool)
    pad[1, 6:] = True  # reference mask: True = padding

    with torch.no_grad():
        out_ref, p_ref, _ = ref(torch.tensor(x), torch.tensor(key),
                                torch.tensor(value),
                                encoder_padding_mask=torch.tensor(pad))

    model = fs.ConvAttentionLayer(hidden, dropout=0.0)
    params = {"in_projection": tp.dense_from_linear(state, "in_projection"),
              "out_projection": tp.dense_from_linear(state, "out_projection")}
    out, p, _ = model.apply(
        {"params": params}, jnp.asarray(x.transpose(1, 0, 2)),
        jnp.asarray(key.transpose(1, 0, 2)),
        jnp.asarray(value.transpose(1, 0, 2)),
        key_keep_mask=jnp.asarray(~pad))
    np.testing.assert_allclose(np.asarray(out),
                               out_ref.numpy().transpose(1, 0, 2), atol=1e-4)
    np.testing.assert_allclose(np.asarray(p), p_ref.numpy(), atol=1e-5)


def test_repeat_expand_2d_matches_reference_loop():
    from diff_vits_tpu.utils.content import repeat_expand_2d

    def ref_loop(content, target_len):  # utils.py:482 semantics
        src_len = content.shape[-1]
        target = np.zeros((content.shape[0], target_len), np.float32)
        temp = np.arange(src_len + 1) * target_len / src_len
        current_pos = 0
        for i in range(target_len):
            if i < temp[current_pos + 1]:
                target[:, i] = content[:, current_pos]
            else:
                current_pos += 1
                target[:, i] = content[:, current_pos]
        return target

    rng = np.random.default_rng(5)
    for src, tgt in [(7, 20), (5, 5), (3, 17), (10, 31)]:
        content = rng.normal(size=(4, src)).astype(np.float32)
        np.testing.assert_array_equal(repeat_expand_2d(content, tgt),
                                      ref_loop(content, tgt))


def test_gaussian_fourier_projection_parity():
    from unet1d.embeddings import GaussianFourierProjection as RefGFP
    from diff_vits_tpu.nn.embeddings import GaussianFourierProjection

    ref = RefGFP(embedding_size=16, scale=2.0, log=True,
                 flip_sin_to_cos=False).eval()
    w = ref.state_dict()["weight"].numpy()

    x = np.asarray([0.5, 1.0, 3.7], np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x)).numpy()

    model = GaussianFourierProjection(embedding_size=16, scale=2.0)
    out = model.apply({"params": {"weight": jnp.asarray(w)}}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)

    # flip variant swaps sin/cos halves
    ref2 = RefGFP(embedding_size=16, scale=1.0, log=False,
                  flip_sin_to_cos=True).eval()
    w2 = ref2.state_dict()["weight"].numpy()
    with torch.no_grad():
        out_ref2 = ref2(torch.tensor(x)).numpy()
    model2 = GaussianFourierProjection(embedding_size=16, log=False,
                                       flip_sin_to_cos=True)
    out2 = model2.apply({"params": {"weight": jnp.asarray(w2)}},
                        jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out2), out_ref2, atol=1e-5)


def test_ada_layer_norm_parity():
    from unet1d.attention import AdaLayerNorm as RefALN

    c, n_emb = 8, 10
    ref = RefALN(c, n_emb).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 5, c)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x), torch.tensor(3)).numpy()

    model = U.AdaLayerNorm(c, n_emb)
    params = {"emb": tp.embedding(state, "emb"),
              "linear": tp.dense_from_linear(state, "linear")}
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(3))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)


@pytest.mark.parametrize("act", [None, "silu"])
def test_ada_group_norm_parity(act):
    from unet1d.attention import AdaGroupNorm as RefAGN

    e_dim, c, groups = 6, 8, 4
    ref = RefAGN(e_dim, c, groups, act_fn=act).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(7)
    b, t = 2, 9
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    emb = rng.normal(size=(b, e_dim)).astype(np.float32)
    with torch.no_grad():
        # reference is [B, C, H, W]; use H=1
        out_ref = ref(bct(x)[:, :, None, :],
                      torch.tensor(emb)).numpy()[:, :, 0, :]

    model = U.AdaGroupNorm(e_dim, c, groups, act_fn=act)
    params = {"linear": tp.dense_from_linear(state, "linear")}
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(emb))
    np.testing.assert_allclose(np.asarray(out),
                               out_ref.transpose(0, 2, 1), atol=1e-4)


def test_spatial_norm_parity():
    from unet1d.attention_processor import SpatialNorm as RefSN

    cf, cz = 64, 16
    ref = RefSN(cf, cz).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(8)
    b, t, s = 2, 12, 5
    f = rng.normal(size=(b, t, cf)).astype(np.float32)
    zq = rng.normal(size=(b, s, cz)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(bct(f)[:, :, None, :],
                      bct(zq)[:, :, None, :]).numpy()[:, :, 0, :]

    model = U.SpatialNorm(cf, cz)
    params = {
        "norm_layer": tp.groupnorm(state, "norm_layer"),
        "conv_y": {"kernel": state["conv_y.weight"].numpy()[:, :, 0, 0].T,
                   "bias": state["conv_y.bias"].numpy()},
        "conv_b": {"kernel": state["conv_b.weight"].numpy()[:, :, 0, 0].T,
                   "bias": state["conv_b.bias"].numpy()},
    }
    out = model.apply({"params": params}, jnp.asarray(f), jnp.asarray(zq))
    np.testing.assert_allclose(np.asarray(out),
                               out_ref.transpose(0, 2, 1), atol=1e-4)


def test_clip_grad_value_parity():
    import commons as ref_commons
    from diff_vits_tpu.train.trainer import clip_grad_value

    rng = np.random.default_rng(9)
    g1 = rng.normal(size=(4, 3)).astype(np.float32)
    g2 = rng.normal(size=(5,)).astype(np.float32) * 2

    p_t = [torch.nn.Parameter(torch.zeros(4, 3)),
           torch.nn.Parameter(torch.zeros(5))]
    p_t[0].grad = torch.tensor(g1.copy())
    p_t[1].grad = torch.tensor(g2.copy())
    total_ref = ref_commons.clip_grad_value_(p_t, 0.5)

    grads = {"a": jnp.asarray(g1), "b": jnp.asarray(g2)}
    clipped, total = clip_grad_value(grads, 0.5)
    np.testing.assert_allclose(float(total), total_ref, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(clipped["a"]),
                               p_t[0].grad.numpy(), atol=1e-7)
    np.testing.assert_allclose(np.asarray(clipped["b"]),
                               p_t[1].grad.numpy(), atol=1e-7)


def test_sinusoidal_positional_embedding_parity():
    import operations as ref_ops

    dim, pad_idx = 16, 0
    ref = ref_ops.SinusoidalPositionalEmbedding(dim, pad_idx, init_size=32)

    tokens = np.array([[5, 9, 3, 0, 0], [7, 0, 0, 0, 0]], np.int64)
    with torch.no_grad():
        out_ref = ref(torch.tensor(tokens)).numpy()

    model = fs.SinusoidalPositionalEmbedding(dim, pad_idx)
    out = model.apply({}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-5)

    # odd embedding dim zero-pads the last channel
    ref_odd = ref_ops.SinusoidalPositionalEmbedding(15, pad_idx, init_size=32)
    with torch.no_grad():
        out_ref_odd = ref_odd(torch.tensor(tokens)).numpy()
    out_odd = fs.SinusoidalPositionalEmbedding(15, pad_idx).apply(
        {}, jnp.asarray(tokens))
    np.testing.assert_allclose(np.asarray(out_odd), out_ref_odd, atol=1e-5)


def test_incremental_attention_matches_causal_full():
    # T incremental decode steps == causal full attention (fairseq
    # MultiheadAttention saved_state semantics, operations.py:432-470)
    rng = np.random.default_rng(10)
    b, h, t, d = 2, 4, 7, 8
    q = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, h, t, d)).astype(np.float32))

    scores = jnp.einsum("bhqd,bhsd->bhqs", q * d ** -0.5, k)
    causal = np.triu(np.ones((t, t), bool), 1)
    scores = jnp.where(jnp.asarray(causal)[None, None], -jnp.inf, scores)
    full = jnp.einsum("bhqs,bhsd->bhqd", jax.nn.softmax(scores, -1), v)

    cache = fs.init_kv_cache(b, t, h, d)
    outs = []
    step = jax.jit(fs.incremental_attention_step)
    for i in range(t):
        o, cache = step(q[:, :, i:i + 1], k[:, :, i:i + 1],
                        v[:, :, i:i + 1], cache)
        outs.append(o)
    np.testing.assert_allclose(np.asarray(jnp.concatenate(outs, axis=2)),
                               np.asarray(full), atol=1e-5)
