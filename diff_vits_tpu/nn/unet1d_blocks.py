"""Complete UNet1D block zoo + ``get_down_block``/``get_up_block`` factories.

Capability parity with the ~20 block variants of the reference's
``unet1d/unet_1d_blocks.py`` that the active configs never reach
(unet_1d_blocks.py:425-3151): Attn/Skip/Encoder/Decoder/ResnetResample/
SimpleCrossAttn/K blocks, the FIR and K resamplers (resnet.py:226-458), the
full-option resnet (resnet.py:461), the deprecated-attn-block attention and
the added-KV attention (attention_processor.py:26,620), and the factory
dispatchers (unet_1d_blocks.py:31,226). The five block types the active
model uses live in ``nn/unet1d.py``; the factories route to them.

Layout is channel-last [B, T, C] throughout (TPU-native; see nn/unet1d.py).

Reference defects found while porting (documented, not replicated — the
reference is a 2-D diffusers file mechanically switched to Conv1d, and
several sub-paths still assume 4-D [B, C, H, W] tensors, so they *crash or
mis-broadcast on the 1-D activations this repo produces*):

- the deprecated-attn-block ``Attention`` path (AttnDown/Up, AttnSkip,
  AttnEncoder/Decoder, UNetMidBlock2D): ``AttnProcessor2_0`` only reshapes
  4-D inputs (attention_processor.py:987-994), so a [B, C, T] input is
  consumed as [batch, seq=C, feature=T] and ``to_q`` (built for C features)
  fails for T != C. Here attention runs over time with channel features,
  the intended semantics.
- ``ResnetBlock2D(down=True, kernel=None)`` uses ``nn.AvgPool2d``
  (resnet.py:581), which pools a 3-D input over (C, T); here: 1-D average
  pooling over T.
- FIR resampling (``upfirdn2d_native``) and the K resamplers are built on
  ``F.conv2d``/``F.pad`` 4-D forms (resnet.py:249-458); here: their exact
  1-D counterparts (separable kernels applied along T).
- ``KAttentionBlock._to_3d/_to_4d`` permute 4-D axes
  (unet_1d_blocks.py:3100-3104) and crash on 1-D; here the block operates
  on [B, T, C] directly.
- The Skip blocks' ``skip_conv`` consumes a 3-channel image skip
  (unet_1d_blocks.py:1319); the channel count is a parameter here
  (``skip_channels``, default 3 to mirror the reference).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from diff_vits_tpu.nn.unet1d import (
    AdaGroupNorm,
    SpatialNorm,
    Transformer1D,
    DualTransformer1D,
    Downsample1D,
    Upsample1D,
)

_ACT = {"swish": nn.silu, "silu": nn.silu, "gelu": lambda x: nn.gelu(x, approximate=False),
        "mish": lambda x: x * jnp.tanh(jax.nn.softplus(x)),
        "relu": nn.relu}


# ---------------------------------------------------------------------------
# Resamplers: FIR (upfirdn), K (reflect-pad binomial), plain pool/nearest
# ---------------------------------------------------------------------------

def upfirdn1d(x, kernel, up: int = 1, down: int = 1,
              pad: Tuple[int, int] = (0, 0)):
    """1-D upfirdn on [B, T, C]: zero-stuff by ``up``, pad, correlate with
    ``kernel`` depthwise, take every ``down``-th sample.

    The 1-D counterpart of the reference's ``upfirdn2d_native``
    (resnet.py: FIR helpers) with a separable kernel applied along T.
    """
    b, t, c = x.shape
    k = jnp.asarray(kernel, jnp.float32)
    if up > 1:
        x = jnp.pad(x[:, :, None, :], ((0, 0), (0, 0), (0, up - 1), (0, 0)))
        x = x.reshape(b, t * up, c)
    p0, p1 = pad
    x = jnp.pad(x, ((0, 0), (max(p0, 0), max(p1, 0)), (0, 0)))
    if p0 < 0:
        x = x[:, -p0:, :]
    if p1 < 0:
        x = x[:, :p1, :]
    w = jnp.tile(k[:, None, None], (1, 1, c)).astype(x.dtype)  # [k, 1, C]
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c)
    if down > 1:
        y = y[:, ::down, :]
    return y


def fir_downsample_1d(x, kernel: Sequence[float] = (1, 3, 3, 1),
                      factor: int = 2, gain: float = 1.0):
    """FIR anti-aliased downsample (resnet.py:362-414, 1-D form)."""
    k = np.asarray(kernel, np.float32)
    k = k / k.sum() * gain
    p = len(k) - factor
    return upfirdn1d(x, k, down=factor, pad=((p + 1) // 2, p // 2))


def fir_upsample_1d(x, kernel: Sequence[float] = (1, 3, 3, 1),
                    factor: int = 2, gain: float = 1.0):
    """FIR interpolating upsample (resnet.py:249-327, 1-D form)."""
    k = np.asarray(kernel, np.float32)
    k = k / k.sum() * (gain * factor)
    p = len(k) - factor
    return upfirdn1d(x, k, up=factor,
                     pad=((p + 1) // 2 + factor - 1, p // 2))


def avg_pool_1d(x, factor: int = 2):
    """Plain average-pool downsample over T (floor semantics)."""
    b, t, c = x.shape
    t2 = (t // factor) * factor
    return x[:, :t2, :].reshape(b, t // factor, factor, c).mean(axis=2)


def nearest_upsample_1d(x, factor: int = 2):
    return jnp.repeat(x, factor, axis=1)


class FirUpsample1D(nn.Module):
    """FIR upsample with optional conv (FirUpsample2D, resnet.py:226).

    ``use_conv`` applies a k3 conv after the FIR resample (the reference's
    fused transpose-conv formulation is 4-D-only; the unfused order here is
    the same operation up to boundary handling). The zoo's uses construct
    it conv-free (unet_1d_blocks.py:2407,2504).
    """
    channels: Optional[int] = None
    out_channels: Optional[int] = None
    use_conv: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = fir_upsample_1d(x, self.fir_kernel)
        if self.use_conv:
            out = self.out_channels or self.channels or x.shape[-1]
            y = nn.Conv(out, (3,), padding="SAME", dtype=self.dtype,
                        name="Conv1d_0")(y)
        return y


class FirDownsample1D(nn.Module):
    """FIR downsample with optional conv (FirDownsample2D, resnet.py:339)."""
    channels: Optional[int] = None
    out_channels: Optional[int] = None
    use_conv: bool = False
    fir_kernel: Sequence[float] = (1, 3, 3, 1)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = fir_downsample_1d(x, self.fir_kernel)
        if self.use_conv:
            out = self.out_channels or self.channels or x.shape[-1]
            y = nn.Conv(out, (3,), padding="SAME", dtype=self.dtype,
                        name="Conv1d_0")(y)
        return y


def k_downsample_1d(x):
    """K-diffusion downsample (KDownsample2D, resnet.py:427-441, 1-D):
    reflect-pad 1, correlate with the binomial kernel [1,3,3,1]/8,
    stride 2."""
    k = np.array([1.0, 3.0, 3.0, 1.0], np.float32) / 8.0
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    c = x.shape[-1]
    w = jnp.tile(jnp.asarray(k)[:, None, None], (1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(2,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c)


def k_upsample_1d(x):
    """K-diffusion upsample (KUpsample2D, resnet.py:444-458, 1-D):
    reflect-pad 1, transpose-conv stride 2 with kernel 2*[1,3,3,1]/8 and
    padding 3 — equivalently: zero-stuff x2 then VALID-correlate (the
    kernel is symmetric). Output length 2*T."""
    k = np.array([1.0, 3.0, 3.0, 1.0], np.float32) / 8.0 * 2.0
    x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)), mode="reflect")
    b, t, c = x.shape
    x = jnp.pad(x[:, :, None, :], ((0, 0), (0, 0), (0, 1), (0, 0)))
    x = x.reshape(b, t * 2, c)[:, :-1, :]  # (T-1)*2+1 zero-stuffed
    w = jnp.tile(jnp.asarray(k)[:, None, None], (1, 1, c)).astype(x.dtype)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID",
        dimension_numbers=("NHC", "HIO", "NHC"), feature_group_count=c)


class KDownsample1D(nn.Module):
    def __call__(self, x):
        return k_downsample_1d(x)


class KUpsample1D(nn.Module):
    def __call__(self, x):
        return k_upsample_1d(x)


# ---------------------------------------------------------------------------
# Attention variants
# ---------------------------------------------------------------------------

class LegacyAttention1D(nn.Module):
    """The deprecated-attn-block ``Attention`` configuration
    (attention_processor.py:26, ``_from_deprecated_attn_block=True``):
    optional input GroupNorm or SpatialNorm, biased q/k/v/out projections,
    fp32 softmax (``upcast_softmax``), residual connection, and output
    rescale. Also serves KAttentionBlock's plain attentions (no norm, no
    residual) via the field defaults.

    x: [B, T, C]; context: optional [B, S, D]; attention_bias: additive
    [B, 1, S] (or [B, 1, T] for self-attention).
    """
    channels: int
    num_heads: int
    dim_head: int
    norm_num_groups: Optional[int] = None
    spatial_norm_dim: Optional[int] = None
    cross_attention_dim: Optional[int] = None
    cross_attention_norm: Optional[str] = None
    use_bias: bool = True
    residual_connection: bool = True
    rescale_output_factor: float = 1.0
    eps: float = 1e-5
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, temb=None, attention_bias=None, *,
                 deterministic: bool = True):
        residual = x
        h = x
        if self.spatial_norm_dim is not None:
            h = SpatialNorm(self.channels, self.spatial_norm_dim,
                            dtype=self.dtype, name="spatial_norm")(h, temb)
        elif self.norm_num_groups is not None:
            h = nn.GroupNorm(num_groups=self.norm_num_groups,
                             epsilon=self.eps, dtype=self.dtype,
                             name="group_norm")(h)
        ctx = h if context is None else context
        if context is not None and self.cross_attention_norm == "layer_norm":
            ctx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name="norm_cross")(ctx)
        inner = self.num_heads * self.dim_head
        q = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype,
                     name="to_q")(h)
        k = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype,
                     name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=self.use_bias, dtype=self.dtype,
                     name="to_v")(ctx)
        b, t, _ = q.shape

        def split(z):
            return z.reshape(b, -1, self.num_heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhtd,bhsd->bhts", split(q), split(k)) \
            * self.dim_head ** -0.5
        if attention_bias is not None:
            scores = scores + attention_bias[:, None, :, :].astype(
                scores.dtype)
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", p, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        out = nn.Dense(self.channels, dtype=self.dtype, name="to_out")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        if self.residual_connection:
            out = out + residual
        return out / self.rescale_output_factor


class AddedKVAttention1D(nn.Module):
    """``Attention`` with learned added key/value projections driven by the
    ``AttnAddedKVProcessor`` (attention_processor.py:620-672): GroupNorm on
    the hidden states, q from hidden, k/v = [projected prompt; self k/v]
    concatenated along the key axis (self part dropped when
    ``only_cross_attention``), residual always added.

    x: [B, T, C]; context: [B, S, added_kv_proj_dim]; context_bias:
    additive [B, 1, S] over the prompt keys (self keys get 0 bias, the
    reference's ``prepare_attention_mask`` zero-padding).
    """
    query_dim: int
    num_heads: int
    dim_head: int
    added_kv_proj_dim: int
    norm_num_groups: Optional[int] = 32
    only_cross_attention: bool = False
    cross_attention_norm: Optional[str] = None
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, context_bias=None, *,
                 deterministic: bool = True):
        residual = x
        h = x
        if self.norm_num_groups is not None:
            h = nn.GroupNorm(num_groups=self.norm_num_groups,
                             epsilon=self.eps, dtype=self.dtype,
                             name="group_norm")(h)
        ctx = context
        if self.cross_attention_norm == "layer_norm":
            ctx = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype,
                               name="norm_cross")(ctx)
        inner = self.num_heads * self.dim_head
        q = nn.Dense(inner, use_bias=True, dtype=self.dtype, name="to_q")(h)
        ck = nn.Dense(inner, use_bias=True, dtype=self.dtype,
                      name="add_k_proj")(ctx)
        cv = nn.Dense(inner, use_bias=True, dtype=self.dtype,
                      name="add_v_proj")(ctx)
        if not self.only_cross_attention:
            sk = nn.Dense(inner, use_bias=True, dtype=self.dtype,
                          name="to_k")(h)
            sv = nn.Dense(inner, use_bias=True, dtype=self.dtype,
                          name="to_v")(h)
            k = jnp.concatenate([ck, sk], axis=1)
            v = jnp.concatenate([cv, sv], axis=1)
        else:
            k, v = ck, cv
        b, t, _ = q.shape

        def split(z):
            return z.reshape(b, -1, self.num_heads,
                             self.dim_head).transpose(0, 2, 1, 3)

        scores = jnp.einsum("bhtd,bhsd->bhts", split(q), split(k)) \
            * self.dim_head ** -0.5
        if context_bias is not None:
            bias = context_bias
            pad = k.shape[1] - bias.shape[-1]
            if pad > 0:  # zero bias over the self keys
                bias = jnp.pad(bias, ((0, 0), (0, 0), (0, pad)))
            scores = scores + bias[:, None, :, :].astype(scores.dtype)
        p = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(
            v.dtype)
        out = jnp.einsum("bhts,bhsd->bhtd", p, split(v))
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        return out + residual


# ---------------------------------------------------------------------------
# Full-option resnet (resnet.py:461 with every configuration knob)
# ---------------------------------------------------------------------------

class ResnetBlockFull(nn.Module):
    """ResnetBlock2D with the complete option surface (resnet.py:461-641):
    time_embedding_norm in {default, scale_shift, ada_group, spatial},
    in-block up/down resampling (plain / 'fir' / 'sde_vp' kernels),
    separate ``groups_out``, ``skip_time_act``, ``output_scale_factor``,
    forced/suppressed shortcut, bias-free shortcut, and a distinct final
    conv width (``conv_out_channels`` = the reference's
    ``conv_2d_out_channels``). The active model's hot path uses the lean
    ``nn.unet1d.ResnetBlock1D`` (scale_shift only) instead.
    """
    in_channels: int
    out_channels: Optional[int] = None
    conv_out_channels: Optional[int] = None
    temb_channels: Optional[int] = 512
    groups: int = 32
    groups_out: Optional[int] = None
    eps: float = 1e-6
    non_linearity: str = "swish"
    skip_time_act: bool = False
    time_embedding_norm: str = "default"
    resample: Optional[str] = None        # None | 'up' | 'down'
    resample_kernel: Optional[str] = None  # None | 'fir' | 'sde_vp'
    output_scale_factor: float = 1.0
    use_in_shortcut: Optional[bool] = None
    conv_shortcut_bias: bool = True
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    def _resample(self, x):
        if self.resample == "up":
            if self.resample_kernel == "fir":
                return fir_upsample_1d(x)
            return nearest_upsample_1d(x)  # 'sde_vp' and plain: nearest x2
        if self.resample == "down":
            if self.resample_kernel == "fir":
                return fir_downsample_1d(x)
            return avg_pool_1d(x)  # 'sde_vp' and plain: avg-pool k2 s2
        return x

    @nn.compact
    def __call__(self, x, temb=None, *, deterministic: bool = True):
        out_ch = self.out_channels or self.in_channels
        conv_out = self.conv_out_channels or out_ch
        groups_out = self.groups_out or self.groups
        act = _ACT[self.non_linearity]
        ada = self.time_embedding_norm == "ada_group"
        spatial = self.time_embedding_norm == "spatial"

        h = x
        if ada:
            h = AdaGroupNorm(self.temb_channels, self.in_channels,
                             self.groups, eps=self.eps, dtype=self.dtype,
                             name="norm1")(h, temb)
        elif spatial:
            h = SpatialNorm(self.in_channels, self.temb_channels,
                            dtype=self.dtype, name="norm1")(h, temb)
        else:
            h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                             dtype=self.dtype, name="norm1")(h)
        h = act(h)

        if self.resample is not None:
            x = self._resample(x)
            h = self._resample(h)

        h = nn.Conv(out_ch, (3,), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)

        temb_proj = None
        if self.temb_channels is not None and not (ada or spatial):
            t = temb if self.skip_time_act else act(temb)
            width = 2 * out_ch if self.time_embedding_norm == "scale_shift" \
                else out_ch
            temb_proj = nn.Dense(width, dtype=self.dtype,
                                 name="time_emb_proj")(t)[:, None, :]

        if temb_proj is not None and self.time_embedding_norm == "default":
            h = h + temb_proj
        if ada:
            h = AdaGroupNorm(self.temb_channels, out_ch, groups_out,
                             eps=self.eps, dtype=self.dtype,
                             name="norm2")(h, temb)
        elif spatial:
            h = SpatialNorm(out_ch, self.temb_channels, dtype=self.dtype,
                            name="norm2")(h, temb)
        else:
            h = nn.GroupNorm(num_groups=groups_out, epsilon=self.eps,
                             dtype=self.dtype, name="norm2")(h)
        if temb_proj is not None and \
                self.time_embedding_norm == "scale_shift":
            scale, shift = jnp.split(temb_proj, 2, axis=-1)
            h = h * (1 + scale) + shift

        h = act(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(conv_out, (3,), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)

        use_short = (self.in_channels != conv_out
                     if self.use_in_shortcut is None
                     else self.use_in_shortcut)
        if use_short:
            x = nn.Dense(conv_out, use_bias=self.conv_shortcut_bias,
                         dtype=self.dtype, name="conv_shortcut")(x)
        return (x + h) / self.output_scale_factor


# ---------------------------------------------------------------------------
# Mid blocks
# ---------------------------------------------------------------------------

class MidBlock1D(nn.Module):
    """UNetMidBlock2D (unet_1d_blocks.py:425): resnet -> [attn -> resnet]xN
    with deprecated-attn-block self attention ('spatial' variant uses
    SpatialNorm conditioning)."""
    in_channels: int
    temb_channels: Optional[int] = 512
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    time_scale_shift: str = "default"
    add_attention: bool = True
    attention_head_dim: Optional[int] = 1
    output_scale_factor: float = 1.0
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, *, deterministic: bool = True):
        head_dim = self.attention_head_dim or self.in_channels
        def resnet(i):
            return ResnetBlockFull(
                self.in_channels, self.in_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dropout=self.dropout, dtype=self.dtype, name=f"resnet_{i}")

        x = resnet(0)(x, temb, deterministic=deterministic)
        for i in range(self.num_layers):
            if self.add_attention:
                spatial = self.time_scale_shift == "spatial"
                x = LegacyAttention1D(
                    self.in_channels, self.in_channels // head_dim, head_dim,
                    norm_num_groups=None if spatial else self.groups,
                    spatial_norm_dim=self.temb_channels if spatial else None,
                    rescale_output_factor=self.output_scale_factor,
                    eps=self.eps, dtype=self.dtype, name=f"attn_{i}")(
                        x, temb=temb, deterministic=deterministic)
            x = resnet(i + 1)(x, temb, deterministic=deterministic)
        return x


class MidBlock1DSimpleCrossAttn(nn.Module):
    """UNetMidBlock2DSimpleCrossAttn (unet_1d_blocks.py:626): resnet ->
    [added-KV attn -> resnet]xN."""
    in_channels: int
    temb_channels: int
    cross_attention_dim: int = 1280
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    attention_head_dim: int = 1
    time_scale_shift: str = "default"
    skip_time_act: bool = False
    only_cross_attention: bool = False
    cross_attention_norm: Optional[str] = None
    output_scale_factor: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, context=None, context_bias=None, *,
                 deterministic: bool = True):
        def resnet(i):
            return ResnetBlockFull(
                self.in_channels, self.in_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                skip_time_act=self.skip_time_act,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")

        x = resnet(0)(x, temb, deterministic=deterministic)
        for i in range(self.num_layers):
            x = AddedKVAttention1D(
                self.in_channels, self.in_channels // self.attention_head_dim,
                self.attention_head_dim,
                added_kv_proj_dim=self.cross_attention_dim,
                norm_num_groups=self.groups,
                only_cross_attention=self.only_cross_attention,
                cross_attention_norm=self.cross_attention_norm,
                dtype=self.dtype, name=f"attn_{i}")(
                    x, context if context is not None else x, context_bias,
                    deterministic=deterministic)
            x = resnet(i + 1)(x, temb, deterministic=deterministic)
        return x


# ---------------------------------------------------------------------------
# Down blocks
# ---------------------------------------------------------------------------

class AttnDownBlock1D(nn.Module):
    """AttnDownBlock2D (unet_1d_blocks.py:749): (resnet -> self-attn) x N +
    conv or resnet downsample."""
    in_channels: int
    out_channels: int
    temb_channels: Optional[int] = 512
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    attention_head_dim: Optional[int] = 1
    time_scale_shift: str = "default"
    output_scale_factor: float = 1.0
    downsample_type: Optional[str] = "conv"   # None | 'conv' | 'resnet'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, *, deterministic: bool = True):
        head_dim = self.attention_head_dim or self.out_channels
        outputs = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=self.temb_channels,
                groups=self.groups, eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            x = LegacyAttention1D(
                self.out_channels, self.out_channels // head_dim, head_dim,
                norm_num_groups=self.groups,
                rescale_output_factor=self.output_scale_factor,
                eps=self.eps, dtype=self.dtype, name=f"attn_{i}")(
                    x, deterministic=deterministic)
            outputs.append(x)
        if self.downsample_type == "conv":
            x = Downsample1D(self.out_channels, dtype=self.dtype,
                             name="downsample")(x)
            outputs.append(x)
        elif self.downsample_type == "resnet":
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                resample="down", dtype=self.dtype, name="downsample")(
                    x, temb, deterministic=deterministic)
            outputs.append(x)
        return x, outputs


class DownEncoderBlock1D(nn.Module):
    """DownEncoderBlock2D (unet_1d_blocks.py:1100): temb-free resnets +
    conv downsample."""
    in_channels: int
    out_channels: int
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    time_scale_shift: str = "default"
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=None,
                groups=self.groups, eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, None, deterministic=deterministic)
        if self.add_downsample:
            x = Downsample1D(self.out_channels, dtype=self.dtype,
                             name="downsample")(x)
        return x


class AttnDownEncoderBlock1D(nn.Module):
    """AttnDownEncoderBlock2D (unet_1d_blocks.py:1160)."""
    in_channels: int
    out_channels: int
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    attention_head_dim: Optional[int] = 1
    time_scale_shift: str = "default"
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        head_dim = self.attention_head_dim or self.out_channels
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=None,
                groups=self.groups, eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, None, deterministic=deterministic)
            x = LegacyAttention1D(
                self.out_channels, self.out_channels // head_dim, head_dim,
                norm_num_groups=self.groups,
                rescale_output_factor=self.output_scale_factor,
                eps=self.eps, dtype=self.dtype, name=f"attn_{i}")(
                    x, deterministic=deterministic)
        if self.add_downsample:
            x = Downsample1D(self.out_channels, dtype=self.dtype,
                             name="downsample")(x)
        return x


class SkipDownBlock1D(nn.Module):
    """SkipDownBlock2D (unet_1d_blocks.py:1345): NCSN++-style block with a
    FIR-downsampled skip stream mixed in through a 1x1 conv."""
    in_channels: int
    out_channels: int
    temb_channels: Optional[int] = 512
    num_layers: int = 1
    eps: float = 1e-6
    time_scale_shift: str = "default"
    output_scale_factor: float = float(np.sqrt(2.0))
    add_downsample: bool = True
    skip_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, skip_sample=None, *,
                 deterministic: bool = True):
        outputs = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=self.temb_channels,
                groups=min(in_ch // 4, 32),
                groups_out=min(self.out_channels // 4, 32), eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            outputs.append(x)
        if self.add_downsample:
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels,
                groups=min(self.out_channels // 4, 32), eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                use_in_shortcut=True, resample="down",
                resample_kernel="fir", dtype=self.dtype,
                name="resnet_down")(x, temb, deterministic=deterministic)
            skip_sample = FirDownsample1D(dtype=self.dtype,
                                          name="downsample")(skip_sample)
            x = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="skip_conv")(skip_sample) + x
            outputs.append(x)
        return x, outputs, skip_sample


class AttnSkipDownBlock1D(nn.Module):
    """AttnSkipDownBlock2D (unet_1d_blocks.py:1244)."""
    in_channels: int
    out_channels: int
    temb_channels: Optional[int] = 512
    num_layers: int = 1
    eps: float = 1e-6
    attention_head_dim: Optional[int] = 1
    time_scale_shift: str = "default"
    output_scale_factor: float = float(np.sqrt(2.0))
    add_downsample: bool = True
    skip_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, skip_sample=None, *,
                 deterministic: bool = True):
        head_dim = self.attention_head_dim or self.out_channels
        outputs = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=self.temb_channels,
                groups=min(in_ch // 4, 32),
                groups_out=min(self.out_channels // 4, 32), eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            x = LegacyAttention1D(
                self.out_channels, self.out_channels // head_dim, head_dim,
                norm_num_groups=32,
                rescale_output_factor=self.output_scale_factor,
                eps=self.eps, dtype=self.dtype, name=f"attn_{i}")(
                    x, deterministic=deterministic)
            outputs.append(x)
        if self.add_downsample:
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels,
                groups=min(self.out_channels // 4, 32), eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                use_in_shortcut=True, resample="down",
                resample_kernel="fir", dtype=self.dtype,
                name="resnet_down")(x, temb, deterministic=deterministic)
            skip_sample = FirDownsample1D(dtype=self.dtype,
                                          name="downsample")(skip_sample)
            x = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="skip_conv")(skip_sample) + x
            outputs.append(x)
        return x, outputs, skip_sample


class ResnetDownsampleBlock1D(nn.Module):
    """ResnetDownsampleBlock2D (unet_1d_blocks.py:1424): resnets + a
    down-resampling resnet."""
    in_channels: int
    out_channels: int
    temb_channels: Optional[int] = 512
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    time_scale_shift: str = "default"
    skip_time_act: bool = False
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, *, deterministic: bool = True):
        outputs = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=self.temb_channels,
                groups=self.groups, eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                skip_time_act=self.skip_time_act,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            outputs.append(x)
        if self.add_downsample:
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                skip_time_act=self.skip_time_act,
                output_scale_factor=self.output_scale_factor,
                resample="down", dtype=self.dtype, name="downsample")(
                    x, temb, deterministic=deterministic)
            outputs.append(x)
        return x, outputs


class SimpleCrossAttnDownBlock1D(nn.Module):
    """SimpleCrossAttnDownBlock2D (unet_1d_blocks.py:1517): (resnet ->
    added-KV attn) x N + down-resampling resnet."""
    in_channels: int
    out_channels: int
    temb_channels: int
    cross_attention_dim: int = 1280
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    attention_head_dim: int = 1
    time_scale_shift: str = "default"
    skip_time_act: bool = False
    only_cross_attention: bool = False
    cross_attention_norm: Optional[str] = None
    output_scale_factor: float = 1.0
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, context=None, context_bias=None, *,
                 deterministic: bool = True):
        outputs = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=self.temb_channels,
                groups=self.groups, eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                skip_time_act=self.skip_time_act,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            x = AddedKVAttention1D(
                self.out_channels,
                self.out_channels // self.attention_head_dim,
                self.attention_head_dim,
                added_kv_proj_dim=self.cross_attention_dim,
                norm_num_groups=self.groups,
                only_cross_attention=self.only_cross_attention,
                cross_attention_norm=self.cross_attention_norm,
                dtype=self.dtype, name=f"attn_{i}")(
                    x, context if context is not None else x, context_bias,
                    deterministic=deterministic)
            outputs.append(x)
        if self.add_downsample:
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                skip_time_act=self.skip_time_act,
                output_scale_factor=self.output_scale_factor,
                resample="down", dtype=self.dtype, name="downsample")(
                    x, temb, deterministic=deterministic)
            outputs.append(x)
        return x, outputs


class KDownBlock1D(nn.Module):
    """KDownBlock2D (unet_1d_blocks.py:1676): ada_group resnets + K
    downsample."""
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 4
    resnet_group_size: int = 32
    eps: float = 1e-5
    add_downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, *, deterministic: bool = True):
        outputs = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=self.temb_channels,
                groups=in_ch // self.resnet_group_size,
                groups_out=self.out_channels // self.resnet_group_size,
                eps=self.eps, non_linearity="gelu",
                time_embedding_norm="ada_group", conv_shortcut_bias=False,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            outputs.append(x)
        if self.add_downsample:
            x = k_downsample_1d(x)
        return x, outputs


class KCrossAttnDownBlock1D(nn.Module):
    """KCrossAttnDownBlock2D (unet_1d_blocks.py:1749): ada_group resnets +
    KAttention blocks + K downsample. Mirrors the reference's skip-output
    quirk: per-layer outputs are ``None`` when there is no downsampler."""
    in_channels: int
    out_channels: int
    temb_channels: int
    cross_attention_dim: int
    num_layers: int = 4
    resnet_group_size: int = 32
    attention_head_dim: int = 64
    add_self_attention: bool = False
    eps: float = 1e-5
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, context=None, context_bias=None, *,
                 deterministic: bool = True):
        outputs = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=self.temb_channels,
                groups=in_ch // self.resnet_group_size,
                groups_out=self.out_channels // self.resnet_group_size,
                eps=self.eps, non_linearity="gelu",
                time_embedding_norm="ada_group", conv_shortcut_bias=False,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            x = KAttentionBlock1D(
                self.out_channels,
                self.out_channels // self.attention_head_dim,
                self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                temb_channels=self.temb_channels,
                add_self_attention=self.add_self_attention,
                group_size=self.resnet_group_size, dtype=self.dtype,
                name=f"attn_{i}")(x, context, temb, context_bias,
                                  deterministic=deterministic)
            outputs.append(None if not self.add_downsample else x)
        if self.add_downsample:
            x = k_downsample_1d(x)
        return x, outputs


class KAttentionBlock1D(nn.Module):
    """KAttentionBlock (unet_1d_blocks.py:3040): AdaGroupNorm-conditioned
    [optional self-attn ->] cross-attn, both residual, no feed-forward.
    The reference's ``_to_3d/_to_4d`` permutes assume 4-D activations and
    crash on this repo's 1-D tensors; here the block is natively [B, T, C].
    """
    dim: int
    num_heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    temb_channels: int = 768
    add_self_attention: bool = False
    attention_bias: bool = True
    cross_attention_norm: Optional[str] = "layer_norm"
    group_size: int = 32
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, temb=None, context_bias=None,
                 attention_bias=None, *, deterministic: bool = True):
        if self.add_self_attention:
            h = AdaGroupNorm(self.temb_channels, self.dim,
                             max(1, self.dim // self.group_size),
                             dtype=self.dtype, name="norm1")(x, temb)
            h = LegacyAttention1D(
                self.dim, self.num_heads, self.dim_head,
                norm_num_groups=None, use_bias=self.attention_bias,
                residual_connection=False, dropout=self.dropout,
                dtype=self.dtype, name="attn1")(
                    h, attention_bias=attention_bias,
                    deterministic=deterministic)
            x = h + x
        h = AdaGroupNorm(self.temb_channels, self.dim,
                         max(1, self.dim // self.group_size),
                         dtype=self.dtype, name="norm2")(x, temb)
        h = LegacyAttention1D(
            self.dim, self.num_heads, self.dim_head,
            norm_num_groups=None, use_bias=self.attention_bias,
            cross_attention_dim=self.cross_attention_dim,
            cross_attention_norm=self.cross_attention_norm,
            residual_connection=False, dropout=self.dropout,
            dtype=self.dtype, name="attn2")(
                h, context=context,
                attention_bias=context_bias if context is not None
                else attention_bias,
                deterministic=deterministic)
        return h + x


# ---------------------------------------------------------------------------
# Up blocks
# ---------------------------------------------------------------------------

class AttnUpBlock1D(nn.Module):
    """AttnUpBlock2D (unet_1d_blocks.py:1877): (concat skip -> resnet ->
    self-attn) x N + conv or resnet upsample."""
    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: Optional[int] = 512
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    attention_head_dim: Optional[int] = 1
    time_scale_shift: str = "default"
    output_scale_factor: float = 1.0
    upsample_type: Optional[str] = "conv"  # None | 'conv' | 'resnet'
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_stack, temb=None, upsample_size=None, *,
                 deterministic: bool = True):
        head_dim = self.attention_head_dim or self.out_channels
        for i in range(self.num_layers):
            res_skip = (self.in_channels if i == self.num_layers - 1
                        else self.out_channels)
            resnet_in = self.prev_output_channel if i == 0 \
                else self.out_channels
            x = jnp.concatenate([x, res_stack.pop()], axis=-1)
            x = ResnetBlockFull(
                resnet_in + res_skip, self.out_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            x = LegacyAttention1D(
                self.out_channels, self.out_channels // head_dim, head_dim,
                norm_num_groups=self.groups,
                rescale_output_factor=self.output_scale_factor,
                eps=self.eps, dtype=self.dtype, name=f"attn_{i}")(
                    x, deterministic=deterministic)
        if self.upsample_type == "conv":
            x = Upsample1D(self.out_channels, dtype=self.dtype,
                           name="upsample")(x, upsample_size)
        elif self.upsample_type == "resnet":
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                resample="up", dtype=self.dtype, name="upsample")(
                    x, temb, deterministic=deterministic)
        return x


class UpDecoderBlock1D(nn.Module):
    """UpDecoderBlock2D (unet_1d_blocks.py:2210)."""
    in_channels: int
    out_channels: int
    temb_channels: Optional[int] = None
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    time_scale_shift: str = "default"
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, *, deterministic: bool = True):
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=self.temb_channels,
                groups=self.groups, eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
        if self.add_upsample:
            x = Upsample1D(self.out_channels, dtype=self.dtype,
                           name="upsample")(x)
        return x


class AttnUpDecoderBlock1D(nn.Module):
    """AttnUpDecoderBlock2D (unet_1d_blocks.py:2265)."""
    in_channels: int
    out_channels: int
    temb_channels: Optional[int] = None
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    attention_head_dim: Optional[int] = 1
    time_scale_shift: str = "default"
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb=None, *, deterministic: bool = True):
        head_dim = self.attention_head_dim or self.out_channels
        spatial = self.time_scale_shift == "spatial"
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, temb_channels=self.temb_channels,
                groups=self.groups, eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            x = LegacyAttention1D(
                self.out_channels, self.out_channels // head_dim, head_dim,
                norm_num_groups=None if spatial else self.groups,
                spatial_norm_dim=self.temb_channels if spatial else None,
                rescale_output_factor=self.output_scale_factor,
                eps=self.eps, dtype=self.dtype, name=f"attn_{i}")(
                    x, temb=temb, deterministic=deterministic)
        if self.add_upsample:
            x = Upsample1D(self.out_channels, dtype=self.dtype,
                           name="upsample")(x)
        return x


class SkipUpBlock1D(nn.Module):
    """SkipUpBlock2D (unet_1d_blocks.py:2464)."""
    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: Optional[int] = 512
    num_layers: int = 1
    eps: float = 1e-6
    time_scale_shift: str = "default"
    output_scale_factor: float = float(np.sqrt(2.0))
    add_upsample: bool = True
    skip_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_stack, temb=None, skip_sample=None, *,
                 deterministic: bool = True):
        for i in range(self.num_layers):
            res_skip = (self.in_channels if i == self.num_layers - 1
                        else self.out_channels)
            resnet_in = self.prev_output_channel if i == 0 \
                else self.out_channels
            x = jnp.concatenate([x, res_stack.pop()], axis=-1)
            x = ResnetBlockFull(
                resnet_in + res_skip, self.out_channels,
                temb_channels=self.temb_channels,
                groups=min((resnet_in + res_skip) // 4, 32),
                groups_out=min(self.out_channels // 4, 32), eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
        if skip_sample is not None:
            skip_sample = fir_upsample_1d(skip_sample)
        else:
            skip_sample = 0.0
        if self.add_upsample:
            h = nn.GroupNorm(num_groups=min(self.out_channels // 4, 32),
                             epsilon=self.eps, dtype=self.dtype,
                             name="skip_norm")(x)
            h = nn.silu(h)
            h = nn.Conv(self.skip_channels, (3,), padding="SAME",
                        dtype=self.dtype, name="skip_conv")(h)
            skip_sample = skip_sample + h
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels,
                groups=min(self.out_channels // 4, 32),
                groups_out=min(self.out_channels // 4, 32), eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                use_in_shortcut=True, resample="up", resample_kernel="fir",
                dtype=self.dtype, name="resnet_up")(
                    x, temb, deterministic=deterministic)
        return x, skip_sample


class AttnSkipUpBlock1D(nn.Module):
    """AttnSkipUpBlock2D (unet_1d_blocks.py:2345): like SkipUpBlock1D with
    one attention after the resnets (the reference builds exactly one,
    unet_1d_blocks.py:2392)."""
    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: Optional[int] = 512
    num_layers: int = 1
    eps: float = 1e-6
    attention_head_dim: Optional[int] = 1
    time_scale_shift: str = "default"
    output_scale_factor: float = float(np.sqrt(2.0))
    add_upsample: bool = True
    skip_channels: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_stack, temb=None, skip_sample=None, *,
                 deterministic: bool = True):
        head_dim = self.attention_head_dim or self.out_channels
        for i in range(self.num_layers):
            res_skip = (self.in_channels if i == self.num_layers - 1
                        else self.out_channels)
            resnet_in = self.prev_output_channel if i == 0 \
                else self.out_channels
            x = jnp.concatenate([x, res_stack.pop()], axis=-1)
            # the reference's groups formula here has a precedence bug
            # (min(resnet_in + res_skip // 4, 32), unet_1d_blocks.py:2376)
            # that still yields 32 for practical widths; replicate the
            # effective value
            x = ResnetBlockFull(
                resnet_in + res_skip, self.out_channels,
                temb_channels=self.temb_channels,
                groups=min(resnet_in + res_skip // 4, 32),
                groups_out=min(self.out_channels // 4, 32), eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
        x = LegacyAttention1D(
            self.out_channels, self.out_channels // head_dim, head_dim,
            norm_num_groups=32,
            rescale_output_factor=self.output_scale_factor,
            eps=self.eps, dtype=self.dtype, name="attn_0")(
                x, deterministic=deterministic)
        if skip_sample is not None:
            skip_sample = fir_upsample_1d(skip_sample)
        else:
            skip_sample = 0.0
        if self.add_upsample:
            h = nn.GroupNorm(num_groups=min(self.out_channels // 4, 32),
                             epsilon=self.eps, dtype=self.dtype,
                             name="skip_norm")(x)
            h = nn.silu(h)
            h = nn.Conv(self.skip_channels, (3,), padding="SAME",
                        dtype=self.dtype, name="skip_conv")(h)
            skip_sample = skip_sample + h
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels,
                groups=min(self.out_channels // 4, 32),
                groups_out=min(self.out_channels // 4, 32), eps=self.eps,
                time_embedding_norm=self.time_scale_shift,
                output_scale_factor=self.output_scale_factor,
                use_in_shortcut=True, resample="up", resample_kernel="fir",
                dtype=self.dtype, name="resnet_up")(
                    x, temb, deterministic=deterministic)
        return x, skip_sample


class ResnetUpsampleBlock1D(nn.Module):
    """ResnetUpsampleBlock2D (unet_1d_blocks.py:2559)."""
    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: Optional[int] = 512
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    time_scale_shift: str = "default"
    skip_time_act: bool = False
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_stack, temb=None, upsample_size=None, *,
                 deterministic: bool = True):
        for i in range(self.num_layers):
            res_skip = (self.in_channels if i == self.num_layers - 1
                        else self.out_channels)
            resnet_in = self.prev_output_channel if i == 0 \
                else self.out_channels
            x = jnp.concatenate([x, res_stack.pop()], axis=-1)
            x = ResnetBlockFull(
                resnet_in + res_skip, self.out_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                skip_time_act=self.skip_time_act,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
        if self.add_upsample:
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                skip_time_act=self.skip_time_act,
                output_scale_factor=self.output_scale_factor,
                resample="up", dtype=self.dtype, name="upsample")(
                    x, temb, deterministic=deterministic)
        return x


class SimpleCrossAttnUpBlock1D(nn.Module):
    """SimpleCrossAttnUpBlock2D (unet_1d_blocks.py:2654)."""
    in_channels: int
    out_channels: int
    prev_output_channel: int
    temb_channels: int
    cross_attention_dim: int = 1280
    num_layers: int = 1
    groups: int = 32
    eps: float = 1e-6
    attention_head_dim: int = 1
    time_scale_shift: str = "default"
    skip_time_act: bool = False
    only_cross_attention: bool = False
    cross_attention_norm: Optional[str] = None
    output_scale_factor: float = 1.0
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_stack, temb=None, context=None,
                 context_bias=None, upsample_size=None, *,
                 deterministic: bool = True):
        for i in range(self.num_layers):
            res_skip = (self.in_channels if i == self.num_layers - 1
                        else self.out_channels)
            resnet_in = self.prev_output_channel if i == 0 \
                else self.out_channels
            x = jnp.concatenate([x, res_stack.pop()], axis=-1)
            x = ResnetBlockFull(
                resnet_in + res_skip, self.out_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                skip_time_act=self.skip_time_act,
                output_scale_factor=self.output_scale_factor,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            x = AddedKVAttention1D(
                self.out_channels,
                self.out_channels // self.attention_head_dim,
                self.attention_head_dim,
                added_kv_proj_dim=self.cross_attention_dim,
                norm_num_groups=self.groups,
                only_cross_attention=self.only_cross_attention,
                cross_attention_norm=self.cross_attention_norm,
                dtype=self.dtype, name=f"attn_{i}")(
                    x, context if context is not None else x, context_bias,
                    deterministic=deterministic)
        if self.add_upsample:
            x = ResnetBlockFull(
                self.out_channels, self.out_channels,
                temb_channels=self.temb_channels, groups=self.groups,
                eps=self.eps, time_embedding_norm=self.time_scale_shift,
                skip_time_act=self.skip_time_act,
                output_scale_factor=self.output_scale_factor,
                resample="up", dtype=self.dtype, name="upsample")(
                    x, temb, deterministic=deterministic)
        return x


class KUpBlock1D(nn.Module):
    """KUpBlock2D (unet_1d_blocks.py:2818): concat the single deepest skip,
    ada_group resnets (2*out -> out -> ... -> in), K upsample."""
    in_channels: int
    out_channels: int
    temb_channels: int
    num_layers: int = 5
    resnet_group_size: Optional[int] = 32
    eps: float = 1e-5
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res, temb=None, upsample_size=None, *,
                 deterministic: bool = True):
        if res is not None:
            x = jnp.concatenate([x, res], axis=-1)
        k_in = 2 * self.out_channels
        k_out = self.in_channels
        n = self.num_layers - 1
        for i in range(n):
            in_ch = k_in if i == 0 else self.out_channels
            out_ch = k_out if i == n - 1 else self.out_channels
            x = ResnetBlockFull(
                in_ch, out_ch, temb_channels=self.temb_channels,
                groups=in_ch // self.resnet_group_size,
                groups_out=self.out_channels // self.resnet_group_size,
                eps=self.eps, non_linearity="gelu",
                time_embedding_norm="ada_group", conv_shortcut_bias=False,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
        if self.add_upsample:
            x = k_upsample_1d(x)
        return x


class KCrossAttnUpBlock1D(nn.Module):
    """KCrossAttnUpBlock2D (unet_1d_blocks.py:2893), incl. the k-unet
    channel plumbing (first/middle-block rules, final conv width)."""
    in_channels: int
    out_channels: int
    temb_channels: int
    cross_attention_dim: int = 768
    num_layers: int = 4
    resnet_group_size: int = 32
    attention_head_dim: int = 1
    eps: float = 1e-5
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res, temb=None, context=None, context_bias=None,
                 upsample_size=None, *, deterministic: bool = True):
        is_first = self.in_channels == self.out_channels == \
            self.temb_channels
        is_middle = self.in_channels != self.out_channels
        add_self_attention = is_first
        k_in = self.out_channels if is_first else 2 * self.out_channels
        k_out = self.in_channels
        if res is not None:
            x = jnp.concatenate([x, res], axis=-1)
        n = self.num_layers - 1
        for i in range(n):
            in_ch = k_in if i == 0 else self.out_channels
            conv_out = k_out if (is_middle and i == n - 1) else None
            attn_dim = k_out if i == n - 1 else self.out_channels
            x = ResnetBlockFull(
                in_ch, self.out_channels, conv_out_channels=conv_out,
                temb_channels=self.temb_channels,
                groups=in_ch // self.resnet_group_size,
                groups_out=self.out_channels // self.resnet_group_size,
                eps=self.eps, non_linearity="gelu",
                time_embedding_norm="ada_group", conv_shortcut_bias=False,
                dtype=self.dtype, name=f"resnet_{i}")(
                    x, temb, deterministic=deterministic)
            x = KAttentionBlock1D(
                attn_dim, attn_dim // self.attention_head_dim,
                self.attention_head_dim,
                cross_attention_dim=self.cross_attention_dim,
                temb_channels=self.temb_channels,
                add_self_attention=add_self_attention,
                group_size=self.resnet_group_size, dtype=self.dtype,
                name=f"attn_{i}")(x, context, temb, context_bias,
                                  deterministic=deterministic)
        if self.add_upsample:
            x = k_upsample_1d(x)
        return x


# ---------------------------------------------------------------------------
# Factories (unet_1d_blocks.py:31-223, 226-422)
# ---------------------------------------------------------------------------

def _canon(block_type: str) -> str:
    if block_type.startswith("UNetRes"):
        block_type = block_type[7:]
    # accept both the reference's historical '2D' names and '1D'
    return block_type.replace("1D", "2D")


def get_down_block(
    down_block_type, num_layers, in_channels, out_channels, temb_channels,
    add_downsample, resnet_eps=1e-6, resnet_act_fn="swish",
    transformer_layers_per_block=1, num_attention_heads=None,
    resnet_groups=None, cross_attention_dim=None, downsample_padding=None,
    dual_cross_attention=False, use_linear_projection=False,
    only_cross_attention=False, upcast_attention=False,
    resnet_time_scale_shift="default", resnet_skip_time_act=False,
    resnet_out_scale_factor=1.0, cross_attention_norm=None,
    attention_head_dim=None, downsample_type=None, dtype=jnp.float32,
    name=None,
):
    """Build a down block by type name (unet_1d_blocks.py:31-223).

    Returns a flax module; forward signatures vary by family exactly as in
    the reference (plain/cross-attn/skip/K). ``name`` threads the flax
    module name through.
    """
    from diff_vits_tpu.nn.unet1d import CrossAttnDownBlock1D, DownBlock1D

    if attention_head_dim is None:
        attention_head_dim = num_attention_heads
    t = _canon(down_block_type)
    groups = resnet_groups if resnet_groups is not None else 32
    kw = dict(dtype=dtype, name=name)
    if t == "DownBlock2D":
        return DownBlock1D(in_channels, out_channels, num_layers=num_layers,
                           groups=groups, add_downsample=add_downsample,
                           **kw)
    if t == "ResnetDownsampleBlock2D":
        return ResnetDownsampleBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            num_layers=num_layers, groups=groups, eps=resnet_eps,
            time_scale_shift=resnet_time_scale_shift,
            skip_time_act=resnet_skip_time_act,
            output_scale_factor=resnet_out_scale_factor,
            add_downsample=add_downsample, **kw)
    if t == "AttnDownBlock2D":
        if add_downsample is False:
            downsample_type = None
        else:
            downsample_type = downsample_type or "conv"
        return AttnDownBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            num_layers=num_layers, groups=groups, eps=resnet_eps,
            attention_head_dim=attention_head_dim,
            time_scale_shift=resnet_time_scale_shift,
            downsample_type=downsample_type, **kw)
    if t == "CrossAttnDownBlock2D":
        if cross_attention_dim is None:
            raise ValueError(
                "cross_attention_dim must be specified for "
                "CrossAttnDownBlock2D")
        return CrossAttnDownBlock1D(
            in_channels, out_channels, num_layers=num_layers,
            num_heads=num_attention_heads,
            cross_attention_dim=cross_attention_dim, groups=groups,
            add_downsample=add_downsample, **kw)
    if t == "SimpleCrossAttnDownBlock2D":
        if cross_attention_dim is None:
            raise ValueError(
                "cross_attention_dim must be specified for "
                "SimpleCrossAttnDownBlock2D")
        return SimpleCrossAttnDownBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            cross_attention_dim=cross_attention_dim, num_layers=num_layers,
            groups=groups, eps=resnet_eps,
            attention_head_dim=attention_head_dim,
            time_scale_shift=resnet_time_scale_shift,
            skip_time_act=resnet_skip_time_act,
            only_cross_attention=only_cross_attention,
            cross_attention_norm=cross_attention_norm,
            output_scale_factor=resnet_out_scale_factor,
            add_downsample=add_downsample, **kw)
    if t == "SkipDownBlock2D":
        return SkipDownBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            num_layers=num_layers, eps=resnet_eps,
            time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, **kw)
    if t == "AttnSkipDownBlock2D":
        return AttnSkipDownBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            num_layers=num_layers, eps=resnet_eps,
            attention_head_dim=attention_head_dim,
            time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, **kw)
    if t == "DownEncoderBlock2D":
        return DownEncoderBlock1D(
            in_channels, out_channels, num_layers=num_layers, groups=groups,
            eps=resnet_eps, time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, **kw)
    if t == "AttnDownEncoderBlock2D":
        return AttnDownEncoderBlock1D(
            in_channels, out_channels, num_layers=num_layers, groups=groups,
            eps=resnet_eps, attention_head_dim=attention_head_dim,
            time_scale_shift=resnet_time_scale_shift,
            add_downsample=add_downsample, **kw)
    if t == "KDownBlock2D":
        return KDownBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            num_layers=num_layers, eps=resnet_eps,
            add_downsample=add_downsample, **kw)
    if t == "KCrossAttnDownBlock2D":
        return KCrossAttnDownBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            cross_attention_dim=cross_attention_dim, num_layers=num_layers,
            attention_head_dim=attention_head_dim or 64, eps=resnet_eps,
            add_self_attention=not add_downsample,
            add_downsample=add_downsample, **kw)
    raise ValueError(f"{down_block_type} does not exist.")


def get_up_block(
    up_block_type, num_layers, in_channels, out_channels,
    prev_output_channel, temb_channels, add_upsample, resnet_eps=1e-6,
    resnet_act_fn="swish", transformer_layers_per_block=1,
    num_attention_heads=None, resnet_groups=None, cross_attention_dim=None,
    dual_cross_attention=False, use_linear_projection=False,
    only_cross_attention=False, upcast_attention=False,
    resnet_time_scale_shift="default", resnet_skip_time_act=False,
    resnet_out_scale_factor=1.0, cross_attention_norm=None,
    attention_head_dim=None, upsample_type=None, dtype=jnp.float32,
    name=None,
):
    """Build an up block by type name (unet_1d_blocks.py:226-422)."""
    from diff_vits_tpu.nn.unet1d import CrossAttnUpBlock1D, UpBlock1D

    if attention_head_dim is None:
        attention_head_dim = num_attention_heads
    t = _canon(up_block_type)
    groups = resnet_groups if resnet_groups is not None else 32
    kw = dict(dtype=dtype, name=name)
    if t == "UpBlock2D":
        return UpBlock1D(in_channels, out_channels,
                         prev_output_channel=prev_output_channel,
                         num_layers=num_layers, groups=groups,
                         add_upsample=add_upsample, **kw)
    if t == "ResnetUpsampleBlock2D":
        return ResnetUpsampleBlock1D(
            in_channels, out_channels,
            prev_output_channel=prev_output_channel,
            temb_channels=temb_channels, num_layers=num_layers,
            groups=groups, eps=resnet_eps,
            time_scale_shift=resnet_time_scale_shift,
            skip_time_act=resnet_skip_time_act,
            output_scale_factor=resnet_out_scale_factor,
            add_upsample=add_upsample, **kw)
    if t == "CrossAttnUpBlock2D":
        if cross_attention_dim is None:
            raise ValueError(
                "cross_attention_dim must be specified for "
                "CrossAttnUpBlock2D")
        return CrossAttnUpBlock1D(
            in_channels, out_channels,
            prev_output_channel=prev_output_channel, num_layers=num_layers,
            num_heads=num_attention_heads,
            cross_attention_dim=cross_attention_dim, groups=groups,
            add_upsample=add_upsample, **kw)
    if t == "SimpleCrossAttnUpBlock2D":
        if cross_attention_dim is None:
            raise ValueError(
                "cross_attention_dim must be specified for "
                "SimpleCrossAttnUpBlock2D")
        return SimpleCrossAttnUpBlock1D(
            in_channels, out_channels,
            prev_output_channel=prev_output_channel,
            temb_channels=temb_channels,
            cross_attention_dim=cross_attention_dim, num_layers=num_layers,
            groups=groups, eps=resnet_eps,
            attention_head_dim=attention_head_dim,
            time_scale_shift=resnet_time_scale_shift,
            skip_time_act=resnet_skip_time_act,
            only_cross_attention=only_cross_attention,
            cross_attention_norm=cross_attention_norm,
            output_scale_factor=resnet_out_scale_factor,
            add_upsample=add_upsample, **kw)
    if t == "AttnUpBlock2D":
        if add_upsample is False:
            upsample_type = None
        else:
            upsample_type = upsample_type or "conv"
        return AttnUpBlock1D(
            in_channels, out_channels,
            prev_output_channel=prev_output_channel,
            temb_channels=temb_channels, num_layers=num_layers,
            groups=groups, eps=resnet_eps,
            attention_head_dim=attention_head_dim,
            time_scale_shift=resnet_time_scale_shift,
            upsample_type=upsample_type, **kw)
    if t == "SkipUpBlock2D":
        return SkipUpBlock1D(
            in_channels, out_channels,
            prev_output_channel=prev_output_channel,
            temb_channels=temb_channels, num_layers=num_layers,
            eps=resnet_eps, time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, **kw)
    if t == "AttnSkipUpBlock2D":
        return AttnSkipUpBlock1D(
            in_channels, out_channels,
            prev_output_channel=prev_output_channel,
            temb_channels=temb_channels, num_layers=num_layers,
            eps=resnet_eps, attention_head_dim=attention_head_dim,
            time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, **kw)
    if t == "UpDecoderBlock2D":
        return UpDecoderBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            num_layers=num_layers, groups=groups, eps=resnet_eps,
            time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, **kw)
    if t == "AttnUpDecoderBlock2D":
        return AttnUpDecoderBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            num_layers=num_layers, groups=groups, eps=resnet_eps,
            attention_head_dim=attention_head_dim,
            time_scale_shift=resnet_time_scale_shift,
            add_upsample=add_upsample, **kw)
    if t == "KUpBlock2D":
        return KUpBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            num_layers=num_layers, eps=resnet_eps,
            add_upsample=add_upsample, **kw)
    if t == "KCrossAttnUpBlock2D":
        return KCrossAttnUpBlock1D(
            in_channels, out_channels, temb_channels=temb_channels,
            cross_attention_dim=cross_attention_dim, num_layers=num_layers,
            attention_head_dim=attention_head_dim or 1, eps=resnet_eps,
            add_upsample=add_upsample, **kw)
    raise ValueError(f"{up_block_type} does not exist.")
