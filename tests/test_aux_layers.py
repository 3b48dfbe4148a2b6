"""Coverage for the remaining untested L0/L1 components (SURVEY.md §2.1-2.2):

- ops/attention SDPA vs torch F.scaled_dot_product_attention (attend.py:35)
- TransformerCouplingLayer parity vs modules.py:519
- EncLSTMLayer parity vs operations.py:882 (torch bi-LSTM transplant)
- EncLocalSALayer locality oracle (operations.py:824 — the reference's own
  forward zeroes non-padding query rows, a defect we do not replicate, so
  the test checks the *intended* banded-attention semantics instead)
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
from diff_vits_tpu.nn import fairseq as fs  # noqa: E402
from diff_vits_tpu.nn import flows as Fl  # noqa: E402
from diff_vits_tpu.ops import attention as A  # noqa: E402
from diff_vits_tpu.utils import transplant as tp  # noqa: E402

torch.manual_seed(0)


def bct(x_btc):
    return torch.tensor(np.asarray(x_btc)).transpose(1, 2)


def to_btc(t):
    return t.detach().numpy().transpose(0, 2, 1)


def make_mask(lengths, t):
    return np.asarray(
        masking.sequence_mask(jnp.asarray(lengths), t)).astype(
            np.float32)[..., None]


def test_sdpa_vs_torch():
    rng = np.random.default_rng(0)
    b, h, tq, tk, d = 2, 3, 7, 11, 8
    q = rng.normal(size=(b, h, tq, d)).astype(np.float32)
    k = rng.normal(size=(b, h, tk, d)).astype(np.float32)
    v = rng.normal(size=(b, h, tk, d)).astype(np.float32)
    keep = np.ones((b, tk), bool)
    keep[0, 8:] = False
    keep[1, 5:] = False

    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v),
        attn_mask=torch.tensor(keep)[:, None, None, :])
    out = A.attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                   key_padding_mask=jnp.asarray(keep))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_sdpa_causal_vs_torch():
    rng = np.random.default_rng(1)
    b, h, t, d = 2, 2, 9, 4
    q = rng.normal(size=(b, h, t, d)).astype(np.float32)
    k = rng.normal(size=(b, h, t, d)).astype(np.float32)
    v = rng.normal(size=(b, h, t, d)).astype(np.float32)
    ref = torch.nn.functional.scaled_dot_product_attention(
        torch.tensor(q), torch.tensor(k), torch.tensor(v), is_causal=True)
    out = A.attend(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                   causal=True)
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), atol=1e-5)


def test_transformer_coupling_parity():
    import modules as ref_modules
    c, hdim, k, n, heads, f = 8, 16, 3, 2, 2, 16
    ref = ref_modules.TransformerCouplingLayer(
        c, hdim, k, n, heads, filter_channels=f, mean_only=True).eval()
    with torch.no_grad():  # post is zero-init; randomize to exercise it
        ref.post.weight.normal_(0, 0.1)
        ref.post.bias.normal_(0, 0.1)
    state = ref.state_dict()

    rng = np.random.default_rng(2)
    b, t = 2, 13
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    mask = make_mask([13, 9], t)

    with torch.no_grad():
        out_ref, logdet_ref = ref(bct(x), bct(mask))
        rev_ref = ref(bct(np.asarray(out_ref.transpose(1, 2))), bct(mask),
                      reverse=True)

    model = Fl.TransformerCouplingLayer(c, hdim, k, n, heads,
                                        filter_channels=f, mean_only=True)
    params = {
        "pre": tp.dense_from_conv1x1(state, "pre"),
        "enc": tp.encoder_params(state, "enc", n, window_size=4,
                                 has_spk=False),
        "post": tp.dense_from_conv1x1(state, "post"),
    }
    out, logdet = model.apply({"params": params}, jnp.asarray(x),
                              jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), to_btc(out_ref), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logdet), logdet_ref.numpy(),
                               atol=1e-4)
    rev = model.apply({"params": params}, out, jnp.asarray(mask),
                      reverse=True)
    np.testing.assert_allclose(np.asarray(rev), to_btc(rev_ref), atol=1e-4)


def _lstm_dir_params(state, suffix, c):
    """torch LSTM (i,f,g,o packed) -> flax OptimizedLSTMCell tree."""
    w_ih = state[f"lstm.weight_ih_l0{suffix}"].numpy()
    w_hh = state[f"lstm.weight_hh_l0{suffix}"].numpy()
    b = (state[f"lstm.bias_ih_l0{suffix}"]
         + state[f"lstm.bias_hh_l0{suffix}"]).numpy()
    out = {}
    for gi, gate in enumerate("ifgo"):
        sl = slice(gi * c, (gi + 1) * c)
        out[f"i{gate}"] = {"kernel": w_ih[sl].T}
        out[f"h{gate}"] = {"kernel": w_hh[sl].T, "bias": b[sl]}
    return out


def test_enc_lstm_layer_parity():
    import operations as ref_ops
    c = 8
    ref = ref_ops.EncLSTMLayer(c, dropout=0.0).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(3)
    b, t = 2, 11
    x = rng.normal(size=(t, b, c)).astype(np.float32)  # reference is T,B,C

    with torch.no_grad():
        out_ref = ref(torch.tensor(x))

    model = fs.EncLSTMLayer(dropout=0.0)
    params = {
        "layer_norm": tp.layernorm(state, "layer_norm"),
        "lstm_fwd": _lstm_dir_params(state, "", c),
        "lstm_bwd": _lstm_dir_params(state, "_reverse", c),
        "out_proj": tp.dense_from_linear(state, "out_proj"),
    }
    out = model.apply({"params": params},
                      jnp.asarray(x.transpose(1, 0, 2)))
    np.testing.assert_allclose(np.asarray(out),
                               out_ref.numpy().transpose(1, 0, 2), atol=1e-4)


def test_enc_local_sa_locality():
    """Banded attention + kernel-9 FFN: the receptive field at position p is
    p ± (half_window + 4); perturbations beyond it must not change out[p]."""
    model = fs.EncLocalSALayer(num_heads=2, dropout=0.0,
                               attention_dropout=0.0, chunk_size=7)
    rng = np.random.default_rng(4)
    b, t, c = 1, 24, 8
    x = rng.normal(size=(b, t, c)).astype(np.float32)
    mask = make_mask([t], t)
    params = model.init(jax.random.PRNGKey(0), jnp.asarray(x),
                        jnp.asarray(mask))
    out0 = model.apply(params, jnp.asarray(x), jnp.asarray(mask))

    x2 = x.copy()
    # single channel: a constant across channels is invisible to LN
    x2[0, 20, 0] += 5.0  # distance 15 from p=5 > half(3) + ffn(4)
    out1 = model.apply(params, jnp.asarray(x2), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out0[0, 5]),
                               np.asarray(out1[0, 5]), atol=1e-6)
    # and inside the receptive field it *does* change
    x3 = x.copy()
    x3[0, 7, 0] += 5.0
    out2 = model.apply(params, jnp.asarray(x3), jnp.asarray(mask))
    assert not np.allclose(np.asarray(out0[0, 5]), np.asarray(out2[0, 5]),
                           atol=1e-4)
