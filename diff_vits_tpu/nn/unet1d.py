"""Conditional 1-D UNet denoiser, channel-last flax.linen.

Capability parity with the reference's ``unet1d/`` package (a diffusers
UNet2DConditionModel ported to Conv1d): only the block types reached by the
active configs are implemented — CrossAttnDownBlock / DownBlock / mid
CrossAttn / CrossAttnUpBlock / UpBlock (unet_1d_blocks.py:861,1019,516,
1986,2134), ResnetBlock with scale_shift FiLM (resnet.py:461,619-629),
Transformer block with GEGLU FF (attention.py:26,280), additive -10000
attention-mask bias (unet_1d_condition.py:807-818) and the 'text' additive
embedding via attention pooling (unet_1d_condition.py:869-870).

TPU notes: layout is [B, T, C]; every conv lowers to MXU matmuls; attention
is [B, H, T, D]; skip-connection lengths drive the upsample target size the
same way the reference forces interpolation sizes for non-multiple-of-8
lengths (unet_1d_condition.py:789-797,1009-1010).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.nn.embeddings import TextTimeEmbedding, TimestepEmbedding, Timesteps
from diff_vits_tpu.nn.param_holders import (
    ConvParams as _ConvParams,
    DenseParams as _DenseParams,
    NormParams as _LayerNormParams,
)
from diff_vits_tpu.parallel.activations import constrain_seq


class CrossAttention(nn.Module):
    """diffusers ``Attention`` (attention_processor.py:26) — SDPA semantics.

    q from hidden states, k/v from context (or hidden states when
    ``context is None``); additive bias mask [B, 1, L] broadcast over heads.
    On TPU the score/softmax/PV core routes through the Pallas flash
    kernel (fwd + bwd) via ``ops.flash_attention.sdpa`` — the einsum path
    materializes [B, H, T, S] scores in HBM four times per site;
    ``use_flash`` / DIFF_VITS_FLASH_ATTENTION env overrides.
    """
    query_dim: int
    heads: int
    dim_head: int
    cross_attention_dim: Optional[int] = None
    dropout: float = 0.0
    use_flash: object = "auto"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, attention_bias=None, *,
                 deterministic: bool = True):
        from diff_vits_tpu.ops import flash_attention as FLA

        inner = self.heads * self.dim_head
        ctx = x if context is None else context
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_k")(ctx)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, name="to_v")(ctx)

        b, t, _ = q.shape
        s = k.shape[1]

        def split(t_):
            return t_.reshape(b, -1, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        qh, kh, vh = split(q), split(k), split(v)
        if FLA.flash_ok(qh.shape, kh.shape, self.use_flash):
            out = FLA.sdpa(qh, kh, vh,
                           FLA.bias_to_keep_mask(attention_bias),
                           sm_scale=self.dim_head ** -0.5,
                           use_flash=self.use_flash)
        else:
            scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh) \
                * self.dim_head ** -0.5
            if attention_bias is not None:
                # [B, 1, S] additive bias (0 keep / -10000 discard)
                scores = scores + attention_bias[:, None, :, :].astype(
                    scores.dtype)
            p = jax.nn.softmax(scores, axis=-1)
            out = jnp.einsum("bhts,bhsd->bhtd", p, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, inner)
        out = nn.Dense(self.query_dim, dtype=self.dtype, name="to_out")(out)
        return nn.Dropout(self.dropout, deterministic=deterministic)(out)


class GEGLUFeedForward(nn.Module):
    """GEGLU feed-forward (attention.py:206,280), mult=4."""
    dim: int
    mult: int = 4
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        inner = self.dim * self.mult
        h = nn.Dense(inner * 2, dtype=self.dtype, name="proj")(x)
        h, gate = jnp.split(h, 2, axis=-1)
        h = h * nn.gelu(gate, approximate=False)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return nn.Dense(self.dim, dtype=self.dtype, name="out")(h)


class _CrossAttentionParams(nn.Module):
    """CrossAttention-compatible q/k/v/out weight holder."""
    inner: int
    out_dim: int
    ctx_dim: Optional[int] = None

    @nn.compact
    def __call__(self, q_in: int):
        ctxd = q_in if self.ctx_dim is None else self.ctx_dim
        wq, _ = _DenseParams(self.inner, False, name="to_q")(q_in)
        wk, _ = _DenseParams(self.inner, False, name="to_k")(ctxd)
        wv, _ = _DenseParams(self.inner, False, name="to_v")(ctxd)
        wo, bo = _DenseParams(self.out_dim, True, name="to_out")(self.inner)
        return wq, wk, wv, wo, bo


class _GEGLUParams(nn.Module):
    """GEGLUFeedForward-compatible weight holder."""
    dim: int
    mult: int = 4

    @nn.compact
    def __call__(self):
        inner = self.dim * self.mult
        w1, b1 = _DenseParams(inner * 2, True, name="proj")(self.dim)
        w2, b2 = _DenseParams(self.dim, True, name="out")(inner)
        return w1, b1, w2, b2


class BasicTransformerBlock(nn.Module):
    """LN->self-attn, LN->cross-attn, LN->GEGLU FF. attention.py:26.

    ``use_fused='auto'|True|False``: route through the Pallas fused
    sub-block kernels (ops/fused_transformer.py) — one device op per
    attention / feed-forward instead of ~20. Parameter trees are identical
    either way. 'auto' resolves the ``DIFF_VITS_FUSED[_TRANSFORMER]`` env
    vars and otherwise defaults ON for TPU: measured on v5e (30-step
    UniPC, B=1, T=400) the fused transformer *alone* loses to XLA (15.9 ms
    vs 14.5 ms) but combined with the fused resnet the denoise loop wins
    (12.85 ms vs 14.0 ms), so the pair defaults on together.
    """
    dim: int
    num_heads: int
    head_dim: int
    cross_attention_dim: Optional[int] = None
    dropout: float = 0.0
    use_fused: object = "auto"
    moe_experts: int = 0   # >0: MoE expert feed-forward (EP-shardable)
    moe_top_k: int = 2
    dtype: jnp.dtype = jnp.float32

    def _fused_enabled(self, deterministic, attention_bias, batch):
        if not deterministic or attention_bias is not None \
                or self.moe_experts:
            return False
        if self.num_heads * self.head_dim != self.dim:
            return False
        from diff_vits_tpu.ops import fused_default_for_batch, fused_gate
        # measured with the resnet kernel as a pair: 3.1x win on the b=1
        # latency path, a loss by b=32 — batch-adaptive default
        # (ops.fused_default_for_batch); env/use_fused still force
        return fused_gate("DIFF_VITS_FUSED_TRANSFORMER", self.use_fused,
                          default=fused_default_for_batch(batch))

    @nn.compact
    def __call__(self, x, context=None, attention_bias=None,
                 context_bias=None, *, deterministic: bool = True):
        if self._fused_enabled(deterministic, attention_bias, x.shape[0]):
            from diff_vits_tpu.ops import fused_transformer as FT
            cdt = self.dtype

            def c(w):  # pre-cast weights once in XLA (halves kernel VMEM)
                return w.astype(cdt)

            s1, b1 = _LayerNormParams(name="norm1")(self.dim)
            wq, wk, wv, wo, bo = _CrossAttentionParams(
                self.dim, self.dim, name="attn1")(self.dim)
            x = FT.fused_self_attention(
                x, s1, b1, c(wq), c(wk), c(wv), c(wo), bo,
                heads=self.num_heads, compute_dtype=cdt)
            if self.cross_attention_dim is not None:
                s2, b2 = _LayerNormParams(name="norm2")(self.dim)
                wq2, wk2, wv2, wo2, bo2 = _CrossAttentionParams(
                    self.dim, self.dim, ctx_dim=self.cross_attention_dim,
                    name="attn2")(self.dim)
                x = FT.fused_cross_attention(
                    x, context, context_bias, s2, b2, c(wq2), c(wk2),
                    c(wv2), c(wo2), bo2, heads=self.num_heads,
                    compute_dtype=cdt)
            s3, b3 = _LayerNormParams(name="norm3")(self.dim)
            w1, bb1, w2, bb2 = _GEGLUParams(self.dim, name="ff")()
            return FT.fused_geglu_ff(x, s3, b3, c(w1), bb1, c(w2), bb2,
                                     compute_dtype=cdt)

        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = x + CrossAttention(self.dim, self.num_heads, self.head_dim,
                               dropout=self.dropout, dtype=self.dtype,
                               name="attn1")(h, None, attention_bias,
                                             deterministic=deterministic)
        if self.cross_attention_dim is not None:
            h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)
            x = x + CrossAttention(
                self.dim, self.num_heads, self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                dropout=self.dropout, dtype=self.dtype,
                name="attn2")(h, context, context_bias,
                              deterministic=deterministic)
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm3")(x)
        if self.moe_experts:
            from diff_vits_tpu.parallel.moe import MoEFeedForward
            return x + MoEFeedForward(self.dim, self.moe_experts,
                                      top_k=self.moe_top_k,
                                      dtype=self.dtype, name="ff_moe")(
                                          h, deterministic=deterministic)
        return x + GEGLUFeedForward(self.dim, dropout=self.dropout,
                                    dtype=self.dtype, name="ff")(
                                        h, deterministic=deterministic)


class AdaLayerNorm(nn.Module):
    """LayerNorm modulated by a learned timestep embedding — the
    BasicTransformerBlock ada_norm variant (attention.py:320-337).

    ``timestep`` is a scalar int (the reference chunks the [2C] embedding in
    half); a batched [B] timestep yields per-example [B, 1, C] scale/shift.
    """
    embedding_dim: int
    num_embeddings: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, timestep):
        emb = nn.Embed(self.num_embeddings, self.embedding_dim,
                       dtype=self.dtype, name="emb")(timestep)
        emb = nn.Dense(2 * self.embedding_dim, dtype=self.dtype,
                       name="linear")(nn.silu(emb))
        scale, shift = jnp.split(emb, 2, axis=-1)
        if scale.ndim == 2:  # batched timesteps broadcast over time
            scale, shift = scale[:, None, :], shift[:, None, :]
        x = nn.LayerNorm(use_bias=False, use_scale=False, epsilon=1e-5,
                         dtype=self.dtype, name="norm")(x)
        return x * (1 + scale) + shift


class AdaGroupNorm(nn.Module):
    """GroupNorm modulated by a conditioning embedding (attention.py:360-388).

    Channel-last [B, T, C]; the reference's un-affine ``F.group_norm`` becomes
    a scale/bias-free flax GroupNorm.
    """
    embedding_dim: int
    out_dim: int
    num_groups: int
    act_fn: Optional[str] = None
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb):
        if self.act_fn is not None:
            emb = {"silu": nn.silu, "swish": nn.silu, "mish": _mish,
                   "gelu": nn.gelu}[self.act_fn](emb)
        emb = nn.Dense(self.out_dim * 2, dtype=self.dtype, name="linear")(emb)
        scale, shift = jnp.split(emb, 2, axis=-1)  # [B, C] each
        x = nn.GroupNorm(num_groups=self.num_groups, epsilon=self.eps,
                         use_bias=False, use_scale=False, dtype=self.dtype,
                         name="norm")(x)
        return x * (1 + scale[:, None, :]) + shift[:, None, :]


def _mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


class SpatialNorm(nn.Module):
    """Spatially-conditioned GroupNorm (attention_processor.py:1575-1594),
    1-D: the conditioning latent ``zq`` is nearest-resized to the feature
    length and modulates an affine 32-group GroupNorm via 1x1 convs.
    """
    f_channels: int
    zq_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, f, zq):
        # f: [B, T, C_f], zq: [B, S, C_zq]
        t, s = f.shape[1], zq.shape[1]
        idx = (jnp.arange(t) * s) // t  # torch nearest: floor(dst*S/T)
        zq = zq[:, idx, :]
        norm_f = nn.GroupNorm(num_groups=32, epsilon=1e-6, dtype=self.dtype,
                              name="norm_layer")(f)
        y = nn.Dense(self.f_channels, dtype=self.dtype, name="conv_y")(zq)
        b = nn.Dense(self.f_channels, dtype=self.dtype, name="conv_b")(zq)
        return norm_f * y + b


class Transformer1D(nn.Module):
    """GroupNorm -> 1x1 in -> blocks -> 1x1 out + residual.

    Parity: transformer_1d.py:41 continuous-input path (norm eps 1e-6).
    """
    in_channels: int
    num_heads: int
    head_dim: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 32
    moe_experts: int = 0
    moe_top_k: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context=None, attention_bias=None,
                 context_bias=None, *, deterministic: bool = True):
        residual = x
        h = nn.GroupNorm(num_groups=self.norm_num_groups, epsilon=1e-6,
                         dtype=self.dtype, name="norm")(x)
        h = nn.Dense(self.num_heads * self.head_dim, dtype=self.dtype,
                     name="proj_in")(h)
        for i in range(self.num_layers):
            h = BasicTransformerBlock(
                self.num_heads * self.head_dim, self.num_heads, self.head_dim,
                cross_attention_dim=self.cross_attention_dim,
                moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                dtype=self.dtype, name=f"block_{i}")(
                    h, context, attention_bias, context_bias,
                    deterministic=deterministic)
        h = nn.Dense(self.in_channels, dtype=self.dtype, name="proj_out")(h)
        return h + residual


class DualTransformer1D(nn.Module):
    """Two Transformer1Ds over split conditions, mixed by ``mix_ratio``.

    Capability parity: dual_transformer_1d.py:21 (unused by the active
    reference path). The context is split at ``condition_lengths`` along the
    token axis; transformer ``transformer_index_for_condition[i]`` encodes
    condition i; the residual deltas are blended and re-added.
    """
    in_channels: int
    num_heads: int
    head_dim: int
    num_layers: int = 1
    cross_attention_dim: Optional[int] = None
    norm_num_groups: int = 32
    mix_ratio: float = 0.5
    condition_lengths: Tuple[int, int] = (77, 257)
    transformer_index_for_condition: Tuple[int, int] = (1, 0)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, *, deterministic: bool = True):
        transformers = [
            Transformer1D(self.in_channels, self.num_heads, self.head_dim,
                          self.num_layers, self.cross_attention_dim,
                          self.norm_num_groups, dtype=self.dtype,
                          name=f"transformer_{i}")
            for i in range(2)]
        deltas = []
        start = 0
        for i in range(2):
            cond = context[:, start:start + self.condition_lengths[i]]
            enc = transformers[self.transformer_index_for_condition[i]](
                x, cond, deterministic=deterministic)
            deltas.append(enc - x)
            start += self.condition_lengths[i]
        return (deltas[0] * self.mix_ratio
                + deltas[1] * (1.0 - self.mix_ratio)) + x


class ResnetBlock1D(nn.Module):
    """GN->silu->conv + FiLM(scale_shift) + GN->silu->conv + shortcut.

    Parity: resnet.py:461 with time_embedding_norm='scale_shift'
    (resnet.py:619-629): temb -> silu -> Dense(2*out); h*(1+scale)+shift
    after norm2.

    ``use_fused``: route deterministic scale_shift calls through the
    single-Pallas-program block in ops/fused_resnet.py ('auto' resolves
    the ``DIFF_VITS_FUSED`` env var, default off; parameter trees are
    identical either way; training keeps the XLA formulation).
    """
    in_channels: int
    out_channels: int
    groups: int = 32
    eps: float = 1e-5
    dropout: float = 0.0
    time_embedding_norm: str = "scale_shift"
    use_fused: object = "auto"
    dtype: jnp.dtype = jnp.float32

    def _fused_enabled(self, deterministic: bool, batch: int) -> bool:
        if not deterministic or self.time_embedding_norm != "scale_shift":
            return False
        if self.in_channels % self.groups or self.out_channels % self.groups:
            return False
        from diff_vits_tpu.ops import fused_default_for_batch, fused_gate
        # measured faster than XLA at serving batches, slower at b=32 —
        # batch-adaptive default (ops.fused_default_for_batch)
        return fused_gate("DIFF_VITS_FUSED_RESNET", self.use_fused,
                          default=fused_default_for_batch(batch))

    @nn.compact
    def __call__(self, x, temb, *, deterministic: bool = True):
        if self._fused_enabled(deterministic, x.shape[0]):
            from diff_vits_tpu.ops import fused_resnet as FR
            cdt = self.dtype
            g1s, g1b = _LayerNormParams(name="norm1")(self.in_channels)
            w1, b1 = _ConvParams(self.out_channels,
                                 name="conv1")(self.in_channels)
            wt, bt = _DenseParams(2 * self.out_channels,
                                  name="time_emb_proj")(temb.shape[-1])
            g2s, g2b = _LayerNormParams(name="norm2")(self.out_channels)
            w2, b2 = _ConvParams(self.out_channels,
                                 name="conv2")(self.out_channels)
            if self.in_channels != self.out_channels:
                ws, bs = _DenseParams(self.out_channels,
                                      name="conv_shortcut")(self.in_channels)
            else:
                ws = bs = None
            film = jnp.dot(nn.silu(temb.astype(jnp.float32)),
                           wt.astype(jnp.float32)) + bt
            return FR.fused_resnet_block(
                x, film, g1s, g1b, w1.astype(cdt), b1, g2s, g2b,
                w2.astype(cdt), b2,
                None if ws is None else ws.astype(cdt), bs,
                groups=self.groups, eps=self.eps, compute_dtype=cdt)
        h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                         dtype=self.dtype, name="norm1")(x)
        h = nn.silu(h)
        h = nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype,
                    name="conv1")(h)

        temb = nn.silu(temb)
        if self.time_embedding_norm == "scale_shift":
            temb = nn.Dense(2 * self.out_channels, dtype=self.dtype,
                            name="time_emb_proj")(temb)[:, None, :]
            scale, shift = jnp.split(temb, 2, axis=-1)
            h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                             dtype=self.dtype, name="norm2")(h)
            h = h * (1 + scale) + shift
        else:  # 'default': additive temb before norm2
            temb = nn.Dense(self.out_channels, dtype=self.dtype,
                            name="time_emb_proj")(temb)[:, None, :]
            h = h + temb
            h = nn.GroupNorm(num_groups=self.groups, epsilon=self.eps,
                             dtype=self.dtype, name="norm2")(h)

        h = nn.silu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        h = nn.Conv(self.out_channels, (3,), padding="SAME", dtype=self.dtype,
                    name="conv2")(h)

        if self.in_channels != self.out_channels:
            x = nn.Dense(self.out_channels, dtype=self.dtype,
                         name="conv_shortcut")(x)
        return x + h


class Downsample1D(nn.Module):
    """Strided conv downsample (resnet.py:176, k3 s2 p1)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch Conv1d(k=3, stride=2, padding=1) on length T gives
        # floor((T-1)/2)+1; replicate with explicit pad + VALID.
        x = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        return nn.Conv(self.out_channels, (3,), strides=(2,), padding="VALID",
                       dtype=self.dtype, name="conv")(x)


class Upsample1D(nn.Module):
    """Nearest-neighbour upsample to `output_size` + conv (resnet.py:104)."""
    out_channels: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, output_size: Optional[int] = None):
        b, t, c = x.shape
        if output_size is None or output_size == 2 * t:
            x = jnp.repeat(x, 2, axis=1)
        else:
            # torch nearest: src index = floor(dst * T_in / T_out)
            idx = (jnp.arange(output_size) * t) // output_size
            x = x[:, idx, :]
        return nn.Conv(self.out_channels, (3,), padding="SAME",
                       dtype=self.dtype, name="conv")(x)


class CrossAttnDownBlock1D(nn.Module):
    """(Resnet -> Transformer) x N + optional downsample.

    Parity: unet_1d_blocks.py:861.
    """
    in_channels: int
    out_channels: int
    num_layers: int = 2
    num_heads: int = 8
    cross_attention_dim: int = 128
    groups: int = 8
    add_downsample: bool = True
    moe_experts: int = 0
    moe_top_k: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, context_bias=None,
                 attention_bias=None, *, deterministic: bool = True):
        outputs = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlock1D(in_ch, self.out_channels, groups=self.groups,
                              dtype=self.dtype, name=f"resnet_{i}")(
                                  x, temb, deterministic=deterministic)
            x = Transformer1D(self.out_channels, self.num_heads,
                              self.out_channels // self.num_heads,
                              cross_attention_dim=self.cross_attention_dim,
                              norm_num_groups=self.groups,
                              moe_experts=self.moe_experts,
                              moe_top_k=self.moe_top_k, dtype=self.dtype,
                              name=f"attn_{i}")(
                                  x, context, attention_bias, context_bias,
                                  deterministic=deterministic)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample1D(self.out_channels, dtype=self.dtype,
                             name="downsample")(x)
            outputs.append(x)
        return x, outputs


class DownBlock1D(nn.Module):
    """Resnet x N + optional downsample. Parity: unet_1d_blocks.py:1019."""
    in_channels: int
    out_channels: int
    num_layers: int = 2
    groups: int = 8
    add_downsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, *, deterministic: bool = True):
        outputs = []
        for i in range(self.num_layers):
            in_ch = self.in_channels if i == 0 else self.out_channels
            x = ResnetBlock1D(in_ch, self.out_channels, groups=self.groups,
                              dtype=self.dtype, name=f"resnet_{i}")(
                                  x, temb, deterministic=deterministic)
            outputs.append(x)
        if self.add_downsample:
            x = Downsample1D(self.out_channels, dtype=self.dtype,
                             name="downsample")(x)
            outputs.append(x)
        return x, outputs


class MidBlock1DCrossAttn(nn.Module):
    """Resnet + (Transformer + Resnet) x N. Parity: unet_1d_blocks.py:516."""
    in_channels: int
    num_layers: int = 1
    num_heads: int = 8
    cross_attention_dim: int = 128
    groups: int = 8
    moe_experts: int = 0
    moe_top_k: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, temb, context, context_bias=None,
                 attention_bias=None, *, deterministic: bool = True):
        x = ResnetBlock1D(self.in_channels, self.in_channels,
                          groups=self.groups, dtype=self.dtype,
                          name="resnet_0")(x, temb, deterministic=deterministic)
        for i in range(self.num_layers):
            x = Transformer1D(self.in_channels, self.num_heads,
                              self.in_channels // self.num_heads,
                              cross_attention_dim=self.cross_attention_dim,
                              norm_num_groups=self.groups,
                              moe_experts=self.moe_experts,
                              moe_top_k=self.moe_top_k, dtype=self.dtype,
                              name=f"attn_{i}")(
                                  x, context, attention_bias, context_bias,
                                  deterministic=deterministic)
            x = ResnetBlock1D(self.in_channels, self.in_channels,
                              groups=self.groups, dtype=self.dtype,
                              name=f"resnet_{i + 1}")(
                                  x, temb, deterministic=deterministic)
        return x


class CrossAttnUpBlock1D(nn.Module):
    """(concat skip -> Resnet -> Transformer) x N + optional upsample.

    Parity: unet_1d_blocks.py:1986.
    """
    in_channels: int          # channels of the deepest skip (last layer)
    out_channels: int
    prev_output_channel: int
    num_layers: int = 3
    num_heads: int = 8
    cross_attention_dim: int = 128
    groups: int = 8
    add_upsample: bool = True
    moe_experts: int = 0
    moe_top_k: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_stack, temb, context, context_bias=None,
                 attention_bias=None, upsample_size=None, *,
                 deterministic: bool = True):
        for i in range(self.num_layers):
            res_skip_channels = (self.in_channels
                                 if i == self.num_layers - 1 else self.out_channels)
            resnet_in = self.prev_output_channel if i == 0 else self.out_channels
            res = res_stack.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock1D(resnet_in + res_skip_channels, self.out_channels,
                              groups=self.groups, dtype=self.dtype,
                              name=f"resnet_{i}")(x, temb,
                                                  deterministic=deterministic)
            x = Transformer1D(self.out_channels, self.num_heads,
                              self.out_channels // self.num_heads,
                              cross_attention_dim=self.cross_attention_dim,
                              norm_num_groups=self.groups,
                              moe_experts=self.moe_experts,
                              moe_top_k=self.moe_top_k, dtype=self.dtype,
                              name=f"attn_{i}")(
                                  x, context, attention_bias, context_bias,
                                  deterministic=deterministic)
        if self.add_upsample:
            x = Upsample1D(self.out_channels, dtype=self.dtype,
                           name="upsample")(x, upsample_size)
        return x


class UpBlock1D(nn.Module):
    """(concat skip -> Resnet) x N + optional upsample.

    Parity: unet_1d_blocks.py:2134.
    """
    in_channels: int
    out_channels: int
    prev_output_channel: int
    num_layers: int = 3
    groups: int = 8
    add_upsample: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, res_stack, temb, upsample_size=None, *,
                 deterministic: bool = True):
        for i in range(self.num_layers):
            res_skip_channels = (self.in_channels
                                 if i == self.num_layers - 1 else self.out_channels)
            resnet_in = self.prev_output_channel if i == 0 else self.out_channels
            res = res_stack.pop()
            x = jnp.concatenate([x, res], axis=-1)
            x = ResnetBlock1D(resnet_in + res_skip_channels, self.out_channels,
                              groups=self.groups, dtype=self.dtype,
                              name=f"resnet_{i}")(x, temb,
                                                  deterministic=deterministic)
        if self.add_upsample:
            x = Upsample1D(self.out_channels, dtype=self.dtype,
                           name="upsample")(x, upsample_size)
        return x


class UNet1DConditionModel(nn.Module):
    """The full conditional UNet. Parity: unet_1d_condition.py:61,743.

    Active configuration (both reference uses): down =
    CrossAttn x 3 + Down, mid = CrossAttn, up = Up + CrossAttn x 3,
    layers_per_block 2, norm_num_groups 8, addition_embed_type='text',
    resnet_time_scale_shift='scale_shift'.
    """
    in_channels: int
    out_channels: int
    block_out_channels: Tuple[int, ...] = (128, 256, 384, 512)
    layers_per_block: int = 2
    norm_num_groups: int = 8
    cross_attention_dim: int = 128
    attention_head_dim: int = 8     # = num heads (diffusers naming quirk)
    addition_embed_type: Optional[str] = "text"
    addition_embed_type_num_heads: int = 64
    resnet_time_scale_shift: str = "scale_shift"
    flip_sin_to_cos: bool = True
    freq_shift: float = 0.0
    moe_experts: int = 0    # >0: MoE feed-forward in every transformer
    moe_top_k: int = 2      # block (expert-parallel over an EP mesh axis)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, sample, timestep, encoder_hidden_states,
                 encoder_attention_mask=None, attention_mask=None, *,
                 emb=None, embedding_request=None,
                 deterministic: bool = True):
        """
        Args:
          sample: [B, T, C_in] noisy input.
          timestep: scalar or [B] diffusion step.
          encoder_hidden_states: [B, S, cross_attention_dim] prompt tokens.
          encoder_attention_mask: [B, S] keep mask (1 = keep) or None.
          attention_mask: [B, T] keep mask for self-attention or None.
          emb: optional precomputed [B, 4*ch0] time+text embedding — at
            inference the solver's time grid is static, so all step
            embeddings can be computed in one batched call outside the
            denoise loop instead of ~30x inside it.
          embedding_request: 'time' -> return only the timestep-MLP
            embedding for ``timestep`` [N, 4*ch0]; 'text' -> return only
            the pooled text embedding of ``encoder_hidden_states``
            [B, 4*ch0]. Used by the loop-hoisting precompute.
        Returns:
          [B, T, C_out] prediction.
        """
        ch = self.block_out_channels
        n_blocks = len(ch)
        heads = self.attention_head_dim
        groups = self.norm_num_groups
        time_embed_dim = ch[0] * 4

        # 1. time + additive text embedding (or just the requested part)
        if embedding_request == "text":
            add_heads = min(self.addition_embed_type_num_heads,
                            self.cross_attention_dim)
            return TextTimeEmbedding(
                self.cross_attention_dim, time_embed_dim,
                num_heads=add_heads, dtype=self.dtype,
                name="add_embedding")(encoder_hidden_states)
        if emb is None or embedding_request == "time":
            timesteps = jnp.atleast_1d(jnp.asarray(timestep))
            if embedding_request != "time" and \
                    timesteps.shape[0] != sample.shape[0]:
                timesteps = jnp.broadcast_to(timesteps, (sample.shape[0],))
            t_emb = Timesteps(ch[0], self.flip_sin_to_cos,
                              self.freq_shift)(timesteps)
            t_emb = t_emb.astype(self.dtype)
            emb = TimestepEmbedding(time_embed_dim, dtype=self.dtype,
                                    name="time_embedding")(t_emb)
            if embedding_request == "time":
                return emb
            if self.addition_embed_type == "text":
                # clamp pooling heads so dim_per_head >= 1 on small configs
                add_heads = min(self.addition_embed_type_num_heads,
                                self.cross_attention_dim)
                aug = TextTimeEmbedding(
                    self.cross_attention_dim, time_embed_dim,
                    num_heads=add_heads, dtype=self.dtype,
                    name="add_embedding")(encoder_hidden_states)
                emb = emb + aug
        else:
            emb = emb.astype(self.dtype)

        # masks -> additive bias [B, 1, L] (unet_1d_condition.py:807-818)
        def to_bias(m):
            if m is None:
                return None
            return ((1 - m.astype(jnp.float32)) * -10000.0)[:, None, :]

        attn_bias = to_bias(attention_mask)
        ctx_bias = to_bias(encoder_attention_mask)

        # 2. pre-process
        sample = nn.Conv(ch[0], (3,), padding="SAME", dtype=self.dtype,
                         name="conv_in")(sample)
        # sequence-parallel: under an active 'seq' mesh axis these
        # constraints shard T and GSPMD partitions the convs (halo
        # exchange) and attentions (blockwise) around them; no-ops otherwise
        sample = constrain_seq(sample)

        # 3. down
        res_stack = [sample]
        for i in range(n_blocks):
            in_ch = ch[max(i - 1, 0)]
            is_final = i == n_blocks - 1
            if not is_final:
                sample, outs = CrossAttnDownBlock1D(
                    in_ch, ch[i], num_layers=self.layers_per_block,
                    num_heads=heads, cross_attention_dim=self.cross_attention_dim,
                    groups=groups, add_downsample=True,
                    moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                    dtype=self.dtype,
                    name=f"down_{i}")(sample, emb, encoder_hidden_states,
                                      ctx_bias, attn_bias,
                                      deterministic=deterministic)
            else:
                sample, outs = DownBlock1D(
                    in_ch, ch[i], num_layers=self.layers_per_block,
                    groups=groups, add_downsample=False, dtype=self.dtype,
                    name=f"down_{i}")(sample, emb, deterministic=deterministic)
            sample = constrain_seq(sample)
            res_stack.extend(outs)

        # 4. mid
        sample = MidBlock1DCrossAttn(
            ch[-1], num_heads=heads,
            cross_attention_dim=self.cross_attention_dim, groups=groups,
            moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
            dtype=self.dtype, name="mid")(sample, emb, encoder_hidden_states,
                                          ctx_bias, attn_bias,
                                          deterministic=deterministic)
        sample = constrain_seq(sample)

        # 5. up (reverse channel order; num_layers + 1 resnets per block)
        rev = list(reversed(ch))
        prev_out = rev[0]
        for i in range(n_blocks):
            is_final = i == n_blocks - 1
            out_ch = rev[i]
            in_ch = rev[min(i + 1, n_blocks - 1)]
            # force the upsample size to the next skip's length
            # (unet_1d_condition.py:1009-1010)
            n_res = self.layers_per_block + 1
            upsample_size = (None if is_final
                             else res_stack[-(n_res + 1)].shape[1])
            if i == 0:
                sample = UpBlock1D(
                    in_ch, out_ch, prev_output_channel=prev_out,
                    num_layers=n_res, groups=groups,
                    add_upsample=not is_final, dtype=self.dtype,
                    name=f"up_{i}")(sample, res_stack, emb, upsample_size,
                                    deterministic=deterministic)
            else:
                sample = CrossAttnUpBlock1D(
                    in_ch, out_ch, prev_output_channel=prev_out,
                    num_layers=n_res, num_heads=heads,
                    moe_experts=self.moe_experts, moe_top_k=self.moe_top_k,
                    cross_attention_dim=self.cross_attention_dim,
                    groups=groups, add_upsample=not is_final, dtype=self.dtype,
                    name=f"up_{i}")(sample, res_stack, emb,
                                    encoder_hidden_states, ctx_bias, attn_bias,
                                    upsample_size,
                                    deterministic=deterministic)
            sample = constrain_seq(sample)
            prev_out = out_ch

        # 6. post-process
        sample = nn.GroupNorm(num_groups=groups, epsilon=1e-5,
                              dtype=self.dtype, name="conv_norm_out")(sample)
        sample = nn.silu(sample)
        return nn.Conv(self.out_channels, (3,), padding="SAME",
                       dtype=self.dtype, name="conv_out")(sample)
