"""Golden parity: our flax layers vs the reference torch modules.

Random torch weights are transplanted into our params; outputs must agree.
All reference modules run in eval mode (dropout off) on CPU.
"""
import numpy as np
import pytest

from tests.conftest import reference_available, add_reference_to_path

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)
add_reference_to_path()

import torch  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diff_vits_tpu.core import masking  # noqa: E402
from diff_vits_tpu.nn import layers as L  # noqa: E402
from diff_vits_tpu.nn import flows as Fl  # noqa: E402
from diff_vits_tpu.utils import transplant as tp  # noqa: E402

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow

torch.manual_seed(0)


def bct(x_btc):
    return torch.tensor(np.asarray(x_btc)).transpose(1, 2)


def to_btc(t):
    return t.detach().numpy().transpose(0, 2, 1)


def make_mask(lengths, t):
    return np.asarray(
        masking.sequence_mask(jnp.asarray(lengths), t)).astype(np.float32)[..., None]


def test_wn_parity():
    import modules as ref_modules
    h, k, d, n, gin = 16, 5, 1, 4, 8
    ref = ref_modules.WN(h, k, d, n, gin_channels=gin).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(0)
    b, t = 2, 23
    x = rng.normal(size=(b, t, h)).astype(np.float32)
    g = rng.normal(size=(b, 1, gin)).astype(np.float32)
    mask = make_mask([23, 17], t)

    with torch.no_grad():
        out_ref = ref(bct(x), bct(mask), g=bct(g))

    model = L.WN(h, k, d, n, gin_channels=gin)
    params = tp.wn_params(state, "", n, gin_channels=gin)
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask),
                      g=jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(out), to_btc(out_ref), atol=1e-4)


def test_encoder_parity():
    import attentions as ref_attentions
    h, f, heads, n, k, gin = 32, 48, 2, 4, 3, 8
    ref = ref_attentions.Encoder(h, f, heads, n, k, 0.0,
                                 gin_channels=gin).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(1)
    b, t = 2, 19
    x = rng.normal(size=(b, t, h)).astype(np.float32)
    g = rng.normal(size=(b, 1, gin)).astype(np.float32)
    mask = make_mask([19, 11], t)

    with torch.no_grad():
        out_ref = ref(bct(x), bct(mask), g=bct(g))

    model = L.Encoder(h, f, heads, n, k, 0.0, gin_channels=gin)
    params = tp.encoder_params(state, "", n, window_size=4, has_spk=True)
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask),
                      g=jnp.asarray(g))
    np.testing.assert_allclose(np.asarray(out), to_btc(out_ref), atol=2e-4)


def test_ddsconv_parity():
    import modules as ref_modules
    c, k, n = 24, 3, 3
    ref = ref_modules.DDSConv(c, k, n, p_dropout=0.0).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(2)
    b, t = 2, 15
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    mask = make_mask([15, 9], t)

    with torch.no_grad():
        out_ref = ref(bct(x), bct(mask))

    model = L.DDSConv(c, k, n, p_dropout=0.0)
    params = tp.ddsconv_params(state, "", n)
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), to_btc(out_ref), atol=1e-4)


def test_residual_coupling_parity():
    import modules as ref_modules
    c, h, k, d, n = 8, 16, 5, 1, 3
    ref = ref_modules.ResidualCouplingLayer(c, h, k, d, n, mean_only=True).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(3)
    b, t = 2, 13
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    mask = make_mask([13, 8], t)

    with torch.no_grad():
        out_ref, logdet_ref = ref(bct(x), bct(mask))
        rev_ref = ref(bct(np.asarray(out_ref.transpose(1, 2))), bct(mask),
                      reverse=True)

    model = Fl.ResidualCouplingLayer(c, h, k, d, n, mean_only=True)
    params = {
        "pre": tp.dense_from_conv1x1(state, "pre"),
        "enc": tp.wn_params(state, "enc", n),
        "post": tp.dense_from_conv1x1(state, "post"),
    }
    out, logdet = model.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), to_btc(out_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logdet), logdet_ref.numpy(), atol=1e-4)

    rev = model.apply({"params": params}, out, jnp.asarray(mask), reverse=True)
    np.testing.assert_allclose(np.asarray(rev), to_btc(rev_ref), atol=1e-4)


def test_convflow_parity():
    import modules as ref_modules
    c, f, k, n = 2, 16, 3, 3
    ref = ref_modules.ConvFlow(c, f, k, n).eval()
    state = ref.state_dict()
    # non-zero proj so the spline is exercised
    with torch.no_grad():
        ref.proj.weight.normal_(0, 0.1)
        ref.proj.bias.normal_(0, 0.1)
    state = ref.state_dict()

    rng = np.random.default_rng(4)
    b, t = 2, 11
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    mask = make_mask([11, 7], t)

    with torch.no_grad():
        out_ref, logdet_ref = ref(bct(x), bct(mask))

    model = Fl.ConvFlow(c, f, k, n)
    params = {
        "pre": tp.dense_from_conv1x1(state, "pre"),
        "convs": tp.ddsconv_params(state, "convs", n),
        "proj": tp.dense_from_conv1x1(state, "proj"),
    }
    out, logdet = model.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), to_btc(out_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logdet), logdet_ref.numpy(), atol=1e-3)


def test_enc_sa_layer_parity():
    """EncSALayer (op code 8) vs ours, via the operations registry."""
    from operations import OPERATIONS_ENCODER
    from diff_vits_tpu.nn import fairseq as fs

    c = 32
    ref = OPERATIONS_ENCODER[8](c, 0.0).eval()
    state = {f"op.{k}": v for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(5)
    b, t = 2, 14
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    lengths = [14, 9]
    keep = make_mask(lengths, t)

    # reference takes T x B x C and a bool pad mask [B, T]
    x_tbc = torch.tensor(x).transpose(0, 1)
    pad_mask = torch.tensor(~(keep[..., 0].astype(bool)))
    with torch.no_grad():
        out_ref = ref(x_tbc, encoder_padding_mask=pad_mask)
    out_ref = out_ref.transpose(0, 1).numpy()

    model = fs.EncSALayer(num_heads=8, dropout=0.0, attention_dropout=0.0,
                          relu_dropout=0.0, kernel_size=9)
    params = {
        "layer_norm1": tp.layernorm(state, "op.layer_norm1"),
        "layer_norm2": tp.layernorm(state, "op.layer_norm2"),
        "in_proj": {"kernel": tp._get(state, "op.self_attn.in_proj_weight").T},
        "out_proj": tp.dense_from_linear(state, "op.self_attn.out_proj"),
        "ffn": {
            "ffn_1": tp.ffn1_conv_params(state, "op.ffn", 9),
            "ffn_2": tp.dense_from_linear(state, "op.ffn.ffn_2"),
        },
    }
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(keep))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=2e-4)




def test_enc_gaus_sa_layer_parity():
    """EncGausSALayer (op code 13, gaussian locality bias) vs ours."""
    from operations import OPERATIONS_ENCODER
    from diff_vits_tpu.nn import fairseq as fs

    c = 32
    ref = OPERATIONS_ENCODER[13](c, 0.0, True, 10.0).eval()
    ref.self_attn_gaus_bias.dropout.p = 0.0
    state = {k: v.detach().numpy() for k, v in ref.state_dict().items()}

    rng = np.random.default_rng(6)
    b, t = 2, 12
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    lengths = [12, 8]
    keep = make_mask(lengths, t)

    x_tbc = torch.tensor(x).transpose(0, 1)
    pad_mask = torch.tensor(~(keep[..., 0].astype(bool)))
    with torch.no_grad():
        out_ref = ref(x_tbc.clone(), encoder_padding_mask=pad_mask)
    out_ref = out_ref.transpose(0, 1).numpy()

    model = fs.EncGausSALayer(num_heads=1, dropout=0.0,
                              attention_dropout=0.0, relu_dropout=0.0,
                              gaus_bias=True, gaus_tao=10.0)
    pfx = "self_attn_gaus_bias"
    params = {
        "layer_norm1": tp.layernorm(state, "layer_norm1"),
        "layer_norm2": tp.layernorm(state, "layer_norm2"),
        "w_q": tp.dense_from_linear(state, f"{pfx}.w_q"),
        "w_k": tp.dense_from_linear(state, f"{pfx}.w_k"),
        "w_v": tp.dense_from_linear(state, f"{pfx}.w_v"),
        "fc": tp.dense_from_linear(state, f"{pfx}.fc"),
        "tao": state[f"{pfx}.tao"],
        "ffn": {
            "ffn_1": tp.ffn1_conv_params(state, "ffn", 9),
            "ffn_2": tp.dense_from_linear(state, "ffn.ffn_2"),
        },
    }
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(keep))
    # the reference does not re-mask its residual stream; compare valid rows
    for i, l in enumerate(lengths):
        np.testing.assert_allclose(np.asarray(out)[i, :l], out_ref[i, :l],
                                   atol=2e-4)
