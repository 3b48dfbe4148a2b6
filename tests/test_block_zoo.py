"""UNet1D block zoo: golden parity + oracles + factory coverage.

Strategy per SURVEY.md §2.3: the reference's unused block variants
(unet_1d_blocks.py:425-3151) are tested three ways:

- **golden**: paths the reference executes *correctly* on 1-D tensors
  (resnet-only blocks, conv resamplers, added-KV attention blocks, ada_group
  resnets, and the deprecated attention module driven through its 4-D
  [B, C, 1, T] form) transplant torch weights and assert allclose.
- **oracle**: paths that are 4-D-only/broken in the reference port (FIR/K
  resamplers, KAttentionBlock's reshapes — see the defect list in
  nn/unet1d_blocks.py) are checked against independent numpy/torch 1-D
  formulations.
- **factory coverage**: every one of the 10 down + 10 up block type names
  builds through get_down_block/get_up_block and runs forward.
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tests.conftest import add_reference_to_path, reference_available

from diff_vits_tpu.nn import unet1d_blocks as Z

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow

torch = pytest.importorskip("torch")

B, T, S = 2, 24, 7


def _np(t):
    return t.detach().cpu().numpy()


def _btc(x_bct):
    return jnp.asarray(np.transpose(_np(x_bct), (0, 2, 1)))


# -- torch -> flax param converters -----------------------------------------

def conv_p(sd, prefix):
    p = {"kernel": np.transpose(_np(sd[prefix + ".weight"]), (2, 1, 0))}
    if prefix + ".bias" in sd:
        p["bias"] = _np(sd[prefix + ".bias"])
    return p


def dense_p(sd, prefix):
    p = {"kernel": _np(sd[prefix + ".weight"]).T}
    if prefix + ".bias" in sd:
        p["bias"] = _np(sd[prefix + ".bias"])
    return p


def dense_from_conv1x1_p(sd, prefix):
    w = _np(sd[prefix + ".weight"])  # [out, in, 1]
    p = {"kernel": w[:, :, 0].T}
    if prefix + ".bias" in sd:
        p["bias"] = _np(sd[prefix + ".bias"])
    return p


def gn_p(sd, prefix):
    return {"scale": _np(sd[prefix + ".weight"]),
            "bias": _np(sd[prefix + ".bias"])}


def resnet_full_p(sd, prefix, norm="default"):
    pre = prefix + "." if prefix else ""
    p = {"conv1": conv_p(sd, pre + "conv1"),
         "conv2": conv_p(sd, pre + "conv2")}
    if norm == "ada_group":
        p["norm1"] = {"linear": dense_p(sd, pre + "norm1.linear")}
        p["norm2"] = {"linear": dense_p(sd, pre + "norm2.linear")}
    else:
        p["norm1"] = gn_p(sd, pre + "norm1")
        p["norm2"] = gn_p(sd, pre + "norm2")
    if pre + "time_emb_proj.weight" in sd:
        p["time_emb_proj"] = dense_p(sd, pre + "time_emb_proj")
    if pre + "conv_shortcut.weight" in sd:
        p["conv_shortcut"] = dense_from_conv1x1_p(sd, pre + "conv_shortcut")
    return p


def added_kv_attn_p(sd, prefix):
    p = {"group_norm": gn_p(sd, prefix + ".group_norm"),
         "to_q": dense_p(sd, prefix + ".to_q"),
         "add_k_proj": dense_p(sd, prefix + ".add_k_proj"),
         "add_v_proj": dense_p(sd, prefix + ".add_v_proj"),
         "to_out": dense_p(sd, prefix + ".to_out.0")}
    if prefix + ".to_k.weight" in sd:  # absent when only_cross_attention
        p["to_k"] = dense_p(sd, prefix + ".to_k")
        p["to_v"] = dense_p(sd, prefix + ".to_v")
    return p


@pytest.fixture(scope="module")
def ref():
    if not reference_available():
        pytest.skip("reference not available")
    add_reference_to_path()
    import unet1d.unet_1d_blocks as rb
    import unet1d.attention_processor as rap
    torch.manual_seed(0)
    return rb, rap


# -- golden: resnet-only and conv-resampled blocks ---------------------------

def test_down_encoder_block_golden(ref):
    rb, _ = ref
    m = rb.DownEncoderBlock2D(in_channels=16, out_channels=32, num_layers=2,
                              resnet_groups=4, resnet_eps=1e-6,
                              add_downsample=True).eval()
    sd = m.state_dict()
    x = torch.randn(B, 16, T)
    with torch.no_grad():
        y = m(x)

    ours = Z.DownEncoderBlock1D(16, 32, num_layers=2, groups=4, eps=1e-6,
                                add_downsample=True)
    params = {"resnet_0": resnet_full_p(sd, "resnets.0"),
              "resnet_1": resnet_full_p(sd, "resnets.1"),
              "downsample": {"conv": conv_p(sd, "downsamplers.0.conv")}}
    got = ours.apply({"params": params}, _btc(x))
    np.testing.assert_allclose(np.asarray(got), np.transpose(_np(y),
                                                             (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


def test_up_decoder_block_golden(ref):
    rb, _ = ref
    m = rb.UpDecoderBlock2D(in_channels=32, out_channels=16, num_layers=2,
                            resnet_groups=4, add_upsample=True,
                            temb_channels=None).eval()
    sd = m.state_dict()
    x = torch.randn(B, 32, T)
    with torch.no_grad():
        y = m(x)

    ours = Z.UpDecoderBlock1D(32, 16, num_layers=2, groups=4,
                              add_upsample=True)
    params = {"resnet_0": resnet_full_p(sd, "resnets.0"),
              "resnet_1": resnet_full_p(sd, "resnets.1"),
              "upsample": {"conv": conv_p(sd, "upsamplers.0.conv")}}
    got = ours.apply({"params": params}, _btc(x))
    np.testing.assert_allclose(np.asarray(got), np.transpose(_np(y),
                                                             (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


def test_resnet_downsample_block_golden_no_resample(ref):
    # add_downsample=False: the resample-resnet path is 4-D-broken in the
    # reference (AvgPool2d on 3-D); the resnet stack itself is golden.
    rb, _ = ref
    m = rb.ResnetDownsampleBlock2D(in_channels=16, out_channels=32,
                                   temb_channels=8, num_layers=2,
                                   resnet_groups=4, add_downsample=False,
                                   skip_time_act=True,
                                   output_scale_factor=2.0).eval()
    sd = m.state_dict()
    x = torch.randn(B, 16, T)
    temb = torch.randn(B, 8)
    with torch.no_grad():
        y, outs = m(x, temb)

    ours = Z.ResnetDownsampleBlock1D(16, 32, temb_channels=8, num_layers=2,
                                     groups=4, add_downsample=False,
                                     skip_time_act=True,
                                     output_scale_factor=2.0)
    params = {"resnet_0": resnet_full_p(sd, "resnets.0"),
              "resnet_1": resnet_full_p(sd, "resnets.1")}
    got, outs_j = ours.apply({"params": params}, _btc(x),
                             jnp.asarray(_np(temb)))
    np.testing.assert_allclose(np.asarray(got), np.transpose(_np(y),
                                                             (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)
    assert len(outs_j) == len(outs)


def test_k_resnet_ada_group_oracle(ref):
    """The reference's ada_group resnet (the K blocks' resnet) broadcasts
    its AdaGroupNorm scale/shift as 4-D [B, C, 1, 1] (attention.py:385-387)
    and crashes on this repo's [B, C, T] activations — so the K blocks are
    checked against the *intended* semantics computed manually in torch
    with the reference's own weights and a 1-D broadcast."""
    add_reference_to_path()
    import unet1d.resnet as rr
    import torch.nn.functional as F

    m = rr.ResnetBlock2D(in_channels=32, out_channels=32, temb_channels=8,
                         groups=1, groups_out=1, eps=1e-5,
                         non_linearity="gelu", time_embedding_norm="ada_group",
                         conv_shortcut_bias=False).eval()
    sd = m.state_dict()
    x = torch.randn(B, 32, T)
    temb = torch.randn(B, 8)
    with torch.no_grad():
        e1 = m.norm1.linear(temb)[:, :, None]
        s1, b1 = e1.chunk(2, dim=1)
        h = F.group_norm(x, 1, eps=1e-5) * (1 + s1) + b1
        h = m.conv1(F.gelu(h))
        e2 = m.norm2.linear(temb)[:, :, None]
        s2, b2 = e2.chunk(2, dim=1)
        h = F.group_norm(h, 1, eps=1e-5) * (1 + s2) + b2
        y = x + m.conv2(F.gelu(h))

    ours = Z.ResnetBlockFull(32, 32, temb_channels=8, groups=1, groups_out=1,
                             eps=1e-5, non_linearity="gelu",
                             time_embedding_norm="ada_group",
                             conv_shortcut_bias=False)
    got = ours.apply({"params": resnet_full_p(sd, "", norm="ada_group")},
                     _btc(x), jnp.asarray(_np(temb)))
    np.testing.assert_allclose(np.asarray(got), np.transpose(_np(y),
                                                             (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


# -- golden: added-KV attention blocks ---------------------------------------

def test_mid_block_simple_cross_attn_golden(ref):
    rb, _ = ref
    m = rb.UNetMidBlock2DSimpleCrossAttn(
        in_channels=32, temb_channels=8, cross_attention_dim=24,
        attention_head_dim=8, resnet_groups=4).eval()
    sd = m.state_dict()
    x = torch.randn(B, 32, T)
    temb = torch.randn(B, 8)
    ctx = torch.randn(B, S, 24)
    with torch.no_grad():
        y = m(x, temb, encoder_hidden_states=ctx)

    ours = Z.MidBlock1DSimpleCrossAttn(32, 8, cross_attention_dim=24,
                                       attention_head_dim=8, groups=4)
    params = {"resnet_0": resnet_full_p(sd, "resnets.0"),
              "resnet_1": resnet_full_p(sd, "resnets.1"),
              "attn_0": added_kv_attn_p(sd, "attentions.0")}
    got = ours.apply({"params": params}, _btc(x), jnp.asarray(_np(temb)),
                     jnp.asarray(_np(ctx)))
    np.testing.assert_allclose(np.asarray(got), np.transpose(_np(y),
                                                             (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("only_cross", [False, True])
def test_simple_cross_attn_down_block_golden(ref, only_cross):
    rb, _ = ref
    m = rb.SimpleCrossAttnDownBlock2D(
        in_channels=16, out_channels=32, temb_channels=8,
        cross_attention_dim=24, attention_head_dim=8, resnet_groups=4,
        num_layers=2, add_downsample=False,
        only_cross_attention=only_cross).eval()
    sd = m.state_dict()
    x = torch.randn(B, 16, T)
    temb = torch.randn(B, 8)
    ctx = torch.randn(B, S, 24)
    with torch.no_grad():
        y, _ = m(x, temb, encoder_hidden_states=ctx)

    ours = Z.SimpleCrossAttnDownBlock1D(
        16, 32, temb_channels=8, cross_attention_dim=24,
        attention_head_dim=8, groups=4, num_layers=2, add_downsample=False,
        only_cross_attention=only_cross)
    attn_keys = added_kv_attn_p(sd, "attentions.0")
    attn_keys2 = added_kv_attn_p(sd, "attentions.1")
    params = {"resnet_0": resnet_full_p(sd, "resnets.0"),
              "resnet_1": resnet_full_p(sd, "resnets.1"),
              "attn_0": attn_keys, "attn_1": attn_keys2}
    got, _ = ours.apply({"params": params}, _btc(x), jnp.asarray(_np(temb)),
                        jnp.asarray(_np(ctx)))
    np.testing.assert_allclose(np.asarray(got), np.transpose(_np(y),
                                                             (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


def test_simple_cross_attn_up_block_golden(ref):
    rb, _ = ref
    m = rb.SimpleCrossAttnUpBlock2D(
        in_channels=16, out_channels=32, prev_output_channel=32,
        temb_channels=8, cross_attention_dim=24, attention_head_dim=8,
        resnet_groups=4, num_layers=2, add_upsample=False).eval()
    sd = m.state_dict()
    x = torch.randn(B, 32, T)
    res = (torch.randn(B, 16, T), torch.randn(B, 32, T))
    temb = torch.randn(B, 8)
    ctx = torch.randn(B, S, 24)
    with torch.no_grad():
        y = m(x, res, temb, encoder_hidden_states=ctx)

    ours = Z.SimpleCrossAttnUpBlock1D(
        16, 32, prev_output_channel=32, temb_channels=8,
        cross_attention_dim=24, attention_head_dim=8, groups=4,
        num_layers=2, add_upsample=False)
    params = {"resnet_0": resnet_full_p(sd, "resnets.0"),
              "resnet_1": resnet_full_p(sd, "resnets.1"),
              "attn_0": added_kv_attn_p(sd, "attentions.0"),
              "attn_1": added_kv_attn_p(sd, "attentions.1")}
    stack = [_btc(r) for r in res]
    got = ours.apply({"params": params}, _btc(x), stack,
                     jnp.asarray(_np(temb)), jnp.asarray(_np(ctx)))
    np.testing.assert_allclose(np.asarray(got), np.transpose(_np(y),
                                                             (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


# -- golden: the deprecated-attention module via its 4-D form ----------------

def test_legacy_attention_golden(ref):
    _, rap = ref
    m = rap.Attention(32, heads=4, dim_head=8, rescale_output_factor=1.7,
                      eps=1e-6, norm_num_groups=4, residual_connection=True,
                      bias=True, upcast_softmax=True,
                      _from_deprecated_attn_block=True).eval()
    sd = m.state_dict()
    x = torch.randn(B, 32, T)
    with torch.no_grad():
        # the 4-D [B, C, 1, T] form is the one the processor reshapes
        # correctly; on this repo's 3-D activations it crashes (see defect
        # notes in nn/unet1d_blocks.py)
        y = m(x[:, :, None, :]).squeeze(2)

    ours = Z.LegacyAttention1D(32, 4, 8, norm_num_groups=4,
                               rescale_output_factor=1.7, eps=1e-6)
    params = {"group_norm": gn_p(sd, "group_norm"),
              "to_q": dense_p(sd, "to_q"), "to_k": dense_p(sd, "to_k"),
              "to_v": dense_p(sd, "to_v"),
              "to_out": dense_p(sd, "to_out.0")}
    got = ours.apply({"params": params}, _btc(x))
    np.testing.assert_allclose(np.asarray(got), np.transpose(_np(y),
                                                             (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


def test_k_attention_block_golden(ref):
    rb, _ = ref
    m = rb.KAttentionBlock(32, 4, 8, cross_attention_dim=24,
                           temb_channels=8, attention_bias=True,
                           add_self_attention=True,
                           cross_attention_norm="layer_norm",
                           group_size=8).eval()
    sd = m.state_dict()
    x = torch.randn(B, 32, 1, T)  # 4-D form the reference reshapes correctly
    temb = torch.randn(B, 8)
    ctx = torch.randn(B, S, 24)
    with torch.no_grad():
        y = m(x, encoder_hidden_states=ctx, emb=temb).squeeze(2)

    ours = Z.KAttentionBlock1D(32, 4, 8, cross_attention_dim=24,
                               temb_channels=8, add_self_attention=True,
                               group_size=8)
    params = {
        "norm1": {"linear": dense_p(sd, "norm1.linear")},
        "norm2": {"linear": dense_p(sd, "norm2.linear")},
        "attn1": {"to_q": dense_p(sd, "attn1.to_q"),
                  "to_k": dense_p(sd, "attn1.to_k"),
                  "to_v": dense_p(sd, "attn1.to_v"),
                  "to_out": dense_p(sd, "attn1.to_out.0")},
        "attn2": {"to_q": dense_p(sd, "attn2.to_q"),
                  "to_k": dense_p(sd, "attn2.to_k"),
                  "to_v": dense_p(sd, "attn2.to_v"),
                  "to_out": dense_p(sd, "attn2.to_out.0"),
                  "norm_cross": {"scale": _np(sd["attn2.norm_cross.weight"]),
                                 "bias": _np(sd["attn2.norm_cross.bias"])}},
    }
    got = ours.apply({"params": params},
                     jnp.asarray(np.transpose(_np(x.squeeze(2)), (0, 2, 1))),
                     jnp.asarray(_np(ctx)), jnp.asarray(_np(temb)))
    np.testing.assert_allclose(np.asarray(got), np.transpose(_np(y),
                                                             (0, 2, 1)),
                               rtol=1e-4, atol=1e-5)


# -- oracles: FIR / K resamplers ---------------------------------------------

def _upfirdn1d_np(x, k, up=1, down=1, pad=(0, 0)):
    b, t, c = x.shape
    if up > 1:
        z = np.zeros((b, t * up, c), x.dtype)
        z[:, ::up, :] = x
        x = z
    x = np.pad(x, ((0, 0), pad, (0, 0)))
    t2 = x.shape[1] - len(k) + 1
    out = np.zeros((b, t2, c), np.float32)
    for i in range(len(k)):
        out += k[i] * x[:, i:i + t2, :]
    return out[:, ::down, :]


def test_fir_resample_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, T, 5)).astype(np.float32)
    k = np.array([1, 3, 3, 1], np.float32)

    kd = k / k.sum()
    want = _upfirdn1d_np(x, kd, down=2, pad=(1, 1))
    got = Z.fir_downsample_1d(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)

    ku = k / k.sum() * 2.0
    want = _upfirdn1d_np(x, ku, up=2, pad=(2, 1))
    got = Z.fir_upsample_1d(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)
    assert got.shape == (B, 2 * T, 5)


def test_k_resample_oracle():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(B, T, 5)).astype(np.float32)
    xt = torch.tensor(np.transpose(x, (0, 2, 1)))
    k1 = torch.tensor([1.0, 3.0, 3.0, 1.0]) / 8.0
    c = 5

    w = torch.zeros(c, c, 4)
    idx = torch.arange(c)
    w[idx, idx] = k1
    pad = torch.nn.functional.pad(xt, (1, 1), mode="reflect")
    want = torch.nn.functional.conv1d(pad, w, stride=2)
    got = Z.k_downsample_1d(jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(_np(want), (0, 2, 1)),
                               rtol=1e-5, atol=1e-6)

    w2 = torch.zeros(c, c, 4)
    w2[idx, idx] = k1 * 2.0
    pad = torch.nn.functional.pad(xt, (1, 1), mode="reflect")
    want = torch.nn.functional.conv_transpose1d(pad, w2.transpose(0, 1),
                                                stride=2, padding=3)
    got = Z.k_upsample_1d(jnp.asarray(x))
    assert got.shape == (B, 2 * T, 5)
    np.testing.assert_allclose(np.asarray(got),
                               np.transpose(_np(want), (0, 2, 1)),
                               rtol=1e-5, atol=1e-6)


# -- factory coverage ---------------------------------------------------------

DOWN_TYPES = ["DownBlock2D", "ResnetDownsampleBlock2D", "AttnDownBlock2D",
              "CrossAttnDownBlock2D", "SimpleCrossAttnDownBlock2D",
              "SkipDownBlock2D", "AttnSkipDownBlock2D", "DownEncoderBlock2D",
              "AttnDownEncoderBlock2D", "KDownBlock2D",
              "KCrossAttnDownBlock2D"]
UP_TYPES = ["UpBlock2D", "ResnetUpsampleBlock2D", "CrossAttnUpBlock2D",
            "SimpleCrossAttnUpBlock2D", "AttnUpBlock2D", "SkipUpBlock2D",
            "AttnSkipUpBlock2D", "UpDecoderBlock2D", "AttnUpDecoderBlock2D",
            "KUpBlock2D", "KCrossAttnUpBlock2D"]

_C_IN, _C_OUT, _TEMB, _XDIM = 32, 32, 32, 24


def _run_down(block_type):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(B, T, _C_IN)), jnp.float32)
    temb = jnp.asarray(rng.normal(size=(B, _TEMB)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, S, _XDIM)), jnp.float32)
    skip = jnp.asarray(rng.normal(size=(B, T, 3)), jnp.float32)
    m = Z.get_down_block(block_type, 2, _C_IN, _C_OUT, _TEMB, True,
                         resnet_groups=4, cross_attention_dim=_XDIM,
                         num_attention_heads=4, attention_head_dim=8)
    key = jax.random.PRNGKey(0)
    t = _canon_t(block_type)
    if t in ("DownEncoderBlock2D", "AttnDownEncoderBlock2D"):
        y = m.init_with_output(key, x)[0]
        return (y,)
    if t in ("SkipDownBlock2D", "AttnSkipDownBlock2D"):
        return m.init_with_output(key, x, temb, skip)[0]
    if t == "CrossAttnDownBlock2D":
        return m.init_with_output(key, x, temb, ctx)[0]
    if t in ("SimpleCrossAttnDownBlock2D", "KCrossAttnDownBlock2D"):
        return m.init_with_output(key, x, temb, ctx)[0]
    return m.init_with_output(key, x, temb)[0]


def _canon_t(t):
    return t


@pytest.mark.parametrize("block_type", DOWN_TYPES)
def test_factory_down_blocks_run(block_type):
    out = _run_down(block_type)
    x = out[0]
    assert np.all(np.isfinite(np.asarray(x)))
    assert x.shape[-1] == _C_OUT
    # every type was built with add_downsample=True -> halves T
    assert x.shape[1] == T // 2


@pytest.mark.parametrize("block_type", UP_TYPES)
def test_factory_up_blocks_run(block_type):
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(B, T, _C_OUT)), jnp.float32)
    temb = jnp.asarray(rng.normal(size=(B, _TEMB)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(B, S, _XDIM)), jnp.float32)
    # the skip stream enters a SkipUpBlock one resolution coarser than the
    # hidden states (it is FIR-upsampled before mixing)
    skip = jnp.asarray(rng.normal(size=(B, T // 2, 3)), jnp.float32)
    m = Z.get_up_block(block_type, 2, _C_IN, _C_OUT, _C_OUT, _TEMB, True,
                       resnet_groups=4, cross_attention_dim=_XDIM,
                       num_attention_heads=4, attention_head_dim=8)
    key = jax.random.PRNGKey(0)
    stack = [jnp.asarray(rng.normal(size=(B, T, _C_IN)), jnp.float32),
             jnp.asarray(rng.normal(size=(B, T, _C_OUT)), jnp.float32)]
    if block_type in ("UpDecoderBlock2D", "AttnUpDecoderBlock2D"):
        y = m.init_with_output(key, x, temb)[0]
    elif block_type in ("SkipUpBlock2D", "AttnSkipUpBlock2D"):
        y = m.init_with_output(key, x, stack, temb, skip)[0][0]
    elif block_type == "KUpBlock2D":
        y = m.init_with_output(key, x, x, temb)[0]
    elif block_type == "KCrossAttnUpBlock2D":
        # in==out==temb -> the k-unet "first block": its stored skip is
        # None (unet_1d_blocks.py:2866-2869, 1865-1866)
        y = m.init_with_output(key, x, None, temb, ctx)[0]
    elif block_type in ("CrossAttnUpBlock2D", "SimpleCrossAttnUpBlock2D"):
        y = m.init_with_output(key, x, stack, temb, ctx)[0]
    else:
        y = m.init_with_output(key, x, stack, temb)[0]
    assert np.all(np.isfinite(np.asarray(y)))
    assert y.shape[1] == 2 * T


def test_factory_unknown_raises():
    with pytest.raises(ValueError):
        Z.get_down_block("NoSuchBlock2D", 1, 8, 8, 8, True)
    with pytest.raises(ValueError):
        Z.get_up_block("NoSuchBlock2D", 1, 8, 8, 8, 8, True)


def test_factory_accepts_unetres_prefix_and_1d_names():
    m = Z.get_down_block("UNetResDownBlock2D", 1, 8, 8, 8, True,
                         resnet_groups=4)
    m2 = Z.get_down_block("DownBlock1D", 1, 8, 8, 8, True, resnet_groups=4)
    assert type(m).__name__ == type(m2).__name__ == "DownBlock1D"
