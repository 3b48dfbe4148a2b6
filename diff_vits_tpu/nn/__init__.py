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
