"""UNet1DConditionModel golden parity vs the reference unet1d package."""
import numpy as np
import pytest

from tests.conftest import reference_available, add_reference_to_path

if not reference_available():
    pytest.skip("reference not mounted", allow_module_level=True)
add_reference_to_path()

import torch  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from diff_vits_tpu.nn.unet1d import UNet1DConditionModel  # noqa: E402
from diff_vits_tpu.nn.embeddings import TextTimeEmbedding  # noqa: E402
from diff_vits_tpu.utils import transplant as tp  # noqa: E402

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not slow')
pytestmark = pytest.mark.slow

torch.manual_seed(0)


def test_text_time_embedding_parity():
    from unet1d.embeddings import TextTimeEmbedding as RefTTE
    ref = RefTTE(20, 32, 1).eval()
    state = ref.state_dict()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 9, 20)).astype(np.float32)
    with torch.no_grad():
        out_ref = ref(torch.tensor(x)).numpy()
    model = TextTimeEmbedding(20, 32, num_heads=1)
    params = tp._text_time_embedding_params(state, "")
    out = model.apply({"params": params}, jnp.asarray(x))
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=1e-4)


@pytest.mark.parametrize("length", [48, 45])  # multiple of 8 and ragged
def test_unet_parity(length):
    from unet1d.unet_1d_condition import UNet1DConditionModel as RefUNet

    block_out = (32, 48, 64, 64)
    in_ch, out_ch, cross_dim, heads = 12, 10, 24, 8
    ref = RefUNet(
        in_channels=in_ch,
        out_channels=out_ch,
        block_out_channels=block_out,
        norm_num_groups=8,
        cross_attention_dim=cross_dim,
        attention_head_dim=heads,
        addition_embed_type="text",
        addition_embed_type_num_heads=8,
        resnet_time_scale_shift="scale_shift",
    ).eval()
    state = ref.state_dict()

    rng = np.random.default_rng(1)
    b, s = 2, 13
    x = rng.normal(size=(b, length, in_ch)).astype(np.float32)
    ctx = rng.normal(size=(b, s, cross_dim)).astype(np.float32)
    keep = np.ones((b, s), np.float32)
    keep[1, 9:] = 0.0
    t = np.array([3, 977], np.int64)

    with torch.no_grad():
        out_ref = ref(
            torch.tensor(x).transpose(1, 2), torch.tensor(t),
            torch.tensor(ctx),
            encoder_attention_mask=torch.tensor(keep)).sample
    out_ref = out_ref.numpy().transpose(0, 2, 1)

    model = UNet1DConditionModel(
        in_channels=in_ch, out_channels=out_ch,
        block_out_channels=block_out, norm_num_groups=8,
        cross_attention_dim=cross_dim, attention_head_dim=heads,
        addition_embed_type="text", addition_embed_type_num_heads=8,
        resnet_time_scale_shift="scale_shift")
    params = tp.unet_params(state, block_out)
    out = model.apply({"params": params}, jnp.asarray(x), jnp.asarray(t),
                      jnp.asarray(ctx), encoder_attention_mask=jnp.asarray(keep))
    assert out.shape == out_ref.shape
    np.testing.assert_allclose(np.asarray(out), out_ref, atol=5e-4)
