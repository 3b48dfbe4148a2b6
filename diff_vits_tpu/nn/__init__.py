from diff_vits_tpu.nn.layers import (
    LayerNorm,
    ConvReluNorm,
    DDSConv,
    WN,
    MultiHeadAttention,
    FFN,
    Encoder,
    Decoder,
)

# the full diffusers-style block zoo + factories are imported lazily from
# diff_vits_tpu.nn.unet1d and diff_vits_tpu.nn.unet1d_blocks (they pull in
# the UNet stack; keep the package import light)
