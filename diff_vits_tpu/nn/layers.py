"""Core NN layer library in idiomatic flax.linen, channel-last [B, T, C].

Capability parity with the reference's ``modules.py`` / ``attentions.py``;
layout is redesigned for TPU: channels ride the 128-lane dimension, convs are
flax ``nn.Conv`` (natively NTC), attention is batched [B, H, T, D] matmuls on
the MXU. Weight-norm reparameterizations in the reference (modules.py:160,172)
are intentionally dropped — they are function-space identity; transplant
helpers collapse them when porting torch weights.

Masks are float [B, T, 1] (1 = keep), matching the reference's convention
modulo layout.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.nn.param_holders import DenseParams as _DenseParams


class LayerNorm(nn.Module):
    """LayerNorm over the channel axis. Parity: modules.py:17 (eps 1e-5)."""
    channels: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.eps, dtype=self.dtype, name="ln")(x)


class ConvReluNorm(nn.Module):
    """conv -> LN -> ReLU stack with residual proj. Parity: modules.py:32."""
    in_channels: int
    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, *, deterministic: bool = True):
        x_org = x
        for i in range(self.n_layers):
            x = nn.Conv(self.hidden_channels, (self.kernel_size,),
                        padding="SAME", dtype=self.dtype,
                        name=f"conv_{i}")(x * x_mask)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm_{i}")(x)
            x = nn.relu(x)
            x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = x_org + nn.Dense(self.out_channels, dtype=self.dtype,
                             kernel_init=nn.initializers.zeros,
                             name="proj")(x)
        return x * x_mask


class DDSConv(nn.Module):
    """Dilated depth-separable conv stack. Parity: modules.py:84."""
    channels: int
    kernel_size: int
    n_layers: int
    p_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, *, deterministic: bool = True):
        if g is not None:
            x = x + g
        for i in range(self.n_layers):
            dilation = self.kernel_size ** i
            y = nn.Conv(self.channels, (self.kernel_size,),
                        kernel_dilation=(dilation,), padding="SAME",
                        feature_group_count=self.channels, dtype=self.dtype,
                        name=f"conv_sep_{i}")(x * x_mask)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm1_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dense(self.channels, dtype=self.dtype,
                         name=f"conv_1x1_{i}")(y)
            y = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm2_{i}")(y)
            y = nn.gelu(y, approximate=False)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = x + y
        return x * x_mask


class ResBlock1(nn.Module):
    """HiFi-GAN residual block, 3 dilated + 3 plain convs.

    Parity: modules.py:221 (unused by the active path — the reference has no
    GAN decoder — kept for capability parity; LRELU slope 0.1, weight-norm
    collapsed at transplant time).
    """
    channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, 0.1)
            if x_mask is not None:
                xt = xt * x_mask
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         kernel_dilation=(d,), padding="SAME",
                         dtype=self.dtype, name=f"conv1_{i}")(xt)
            xt = nn.leaky_relu(xt, 0.1)
            if x_mask is not None:
                xt = xt * x_mask
            xt = nn.Conv(self.channels, (self.kernel_size,), padding="SAME",
                         dtype=self.dtype, name=f"conv2_{i}")(xt)
            x = xt + x
        return x * x_mask if x_mask is not None else x


class ResBlock2(nn.Module):
    """HiFi-GAN residual block, 2 dilated convs. Parity: modules.py:318."""
    channels: int
    kernel_size: int = 3
    dilation: tuple = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask=None):
        for i, d in enumerate(self.dilation):
            xt = nn.leaky_relu(x, 0.1)
            if x_mask is not None:
                xt = xt * x_mask
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         kernel_dilation=(d,), padding="SAME",
                         dtype=self.dtype, name=f"conv_{i}")(xt)
            x = xt + x
        return x * x_mask if x_mask is not None else x


class WN(nn.Module):
    """WaveNet core: dilated convs + gated tanh/sigmoid + res/skip.

    Parity: modules.py:133 (same res/skip wiring, same per-layer speaker
    conditioning slices). The fused gate (commons.py:100) is expressed
    directly — XLA fuses the add/tanh/sigmoid/mul chain into the conv
    epilogue on TPU.
    """
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0
    p_dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, *, deterministic: bool = True):
        output = jnp.zeros_like(x)
        h = self.hidden_channels
        if g is not None and self.gin_channels != 0:
            # one 1x1 over g producing all per-layer conditioning at once
            # (modules.py:156-160)
            g_all = nn.Dense(2 * h * self.n_layers, dtype=self.dtype,
                             name="cond_layer")(g)
        else:
            g_all = None

        for i in range(self.n_layers):
            dilation = self.dilation_rate ** i
            x_in = nn.Conv(2 * h, (self.kernel_size,),
                           kernel_dilation=(dilation,), padding="SAME",
                           dtype=self.dtype, name=f"in_{i}")(x)
            if g_all is not None:
                g_l = g_all[..., i * 2 * h:(i + 1) * 2 * h]
            else:
                g_l = jnp.zeros_like(x_in)
            acts = x_in + g_l
            acts = jnp.tanh(acts[..., :h]) * jax.nn.sigmoid(acts[..., h:])
            acts = nn.Dropout(self.p_dropout, deterministic=deterministic)(acts)

            res_skip_channels = 2 * h if i < self.n_layers - 1 else h
            res_skip = nn.Dense(res_skip_channels, dtype=self.dtype,
                                name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask


def _rel_to_abs(x: jax.Array) -> jax.Array:
    """[B, H, L, 2L-1] relative logits -> [B, H, L, L] absolute.

    Parity: attentions.py:255 (pad/reshape/slice index shuffle).
    """
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, 1)))
    x_flat = x.reshape(b, h, l * 2 * l)
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (0, l - 1)))
    return x_flat.reshape(b, h, l + 1, 2 * l - 1)[:, :, :l, l - 1:]


def _abs_to_rel(x: jax.Array) -> jax.Array:
    """[B, H, L, L] absolute weights -> [B, H, L, 2L-1] relative.

    Parity: attentions.py:272.
    """
    b, h, l, _ = x.shape
    x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, l - 1)))
    x_flat = x.reshape(b, h, l * l + l * (l - 1))
    x_flat = jnp.pad(x_flat, ((0, 0), (0, 0), (l, 0)))
    return x_flat.reshape(b, h, l, 2 * l)[:, :, :, 1:]


def _get_relative_embeddings(emb: jax.Array, length: int, window_size: int):
    """Slice/pad the learned rel-pos table to 2*length-1 entries.

    Parity: attentions.py:240. Kept as the oracle for the banded
    formulation below (tests/test_aux_layers.py); the production path uses
    ``_get_band_embeddings`` + ``_band_to_abs``/``_abs_to_band`` instead,
    which never materialize the mostly-zero [.., 2L-1, ..] layout.
    """
    pad_length = max(length - (window_size + 1), 0)
    slice_start = max((window_size + 1) - length, 0)
    if pad_length > 0:
        emb = jnp.pad(emb, ((0, 0), (pad_length, pad_length), (0, 0)))
    return emb[:, slice_start:slice_start + 2 * length - 1]


def _get_band_embeddings(emb: jax.Array, length: int, window_size: int):
    """The nonzero center of ``_get_relative_embeddings``: [g, 2w'+1, d]
    with w' = min(window_size, length-1).

    The reference zero-pads its (2*window+1)-entry table to 2L-1 relative
    positions (attentions.py:240) and then contracts q against ALL of
    them — at the production text length (L=601, window=4) that computes
    601x1201 logits of which only the 9 diagonal bands are nonzero, and
    the skew reshapes shuffle 185 MB per layer (measured 29% of the b=32
    train step in data formatting, docs/bench/trace_b32_r05.txt). The
    banded path is bit-equivalent in exact arithmetic: every dropped term
    is q . 0."""
    w_eff = min(window_size, length - 1)
    start = window_size - w_eff
    return emb[:, start:start + 2 * w_eff + 1]


def _band_onehot(l: int, w: int, dtype) -> jax.Array:
    """One-hot M[t, j, s] = 1 iff s == t + j - w — the banded
    rel->abs placement as a (traced-constant) tensor. 601x9x601 bf16 is
    6.5 MB; XLA folds the iota comparison and feeds the MXU."""
    t = jnp.arange(l)[:, None, None]
    j = jnp.arange(2 * w + 1)[None, :, None]
    s = jnp.arange(l)[None, None, :]
    return (s == t + j - w).astype(dtype)


def _band_to_abs(band: jax.Array) -> jax.Array:
    """[B, H, L, 2w+1] banded rel logits -> [B, H, L, L] absolute scores,
    where band[..., t, j] is the logit for key position s = t + j - w.

    Implemented as a t-batched einsum against the banded one-hot rather
    than the classic pad+flatten+re-chunk skew: the skew's reshapes force
    a re-tiling copy of the [L, L+w] tensor on TPU (measured 0.94 ms per
    op at [32,2,601,605] — ~10 of them per train step), while the einsum
    contracts j=2w+1 on the MXU and fuses with the surrounding adds
    (b=32 step 148.4 -> 126.1 ms, docs/bench/banded_ab_r05.txt). Exact:
    each output element sums exactly one nonzero product."""
    b, h, l, W = band.shape
    w = (W - 1) // 2
    return jnp.einsum("bhtj,tjs->bhts", band,
                      _band_onehot(l, w, band.dtype))


def _abs_to_band(x: jax.Array, w: int) -> jax.Array:
    """[B, H, L, L] absolute weights -> [B, H, L, 2w+1] band
    (j = s - t + w): the inverse placement, same one-hot einsum (each
    band element selects exactly one s), equivalent to ``_abs_to_rel``
    followed by keeping the +-w diagonals."""
    b, h, l, _ = x.shape
    return jnp.einsum("bhts,tjs->bhtj", x, _band_onehot(l, w, x.dtype))


class MultiHeadAttention(nn.Module):
    """Relative-position multi-head attention.

    Parity: attentions.py:142 (window_size rel K/V with heads_share, proximal
    bias, block-local masking, -1e4 additive mask). Layout [B, T, C].

    ``use_fused='auto'|True|False`` routes the production configuration
    (deterministic self-attention, windowed rel K/V, heads_share, no
    proximal/block options) through the single Pallas kernel in
    ops/rel_attention.py. 'auto' resolves the ``DIFF_VITS_FUSED`` env var
    and otherwise stays on the XLA formulation; parameter trees are
    identical either way.
    """
    channels: int
    out_channels: int
    n_heads: int
    p_dropout: float = 0.0
    window_size: Optional[int] = None
    heads_share: bool = True
    block_length: Optional[int] = None
    proximal_bias: bool = False
    proximal_init: bool = False
    use_fused: object = "auto"
    dtype: jnp.dtype = jnp.float32

    def _fused_enabled(self, deterministic: bool, is_self: bool) -> bool:
        if not (deterministic and is_self):
            return False
        if (self.window_size is None or not self.heads_share
                or self.proximal_bias or self.block_length is not None):
            return False
        from diff_vits_tpu.ops import fused_gate
        # ~flat A/B at B=1, XLA faster at B>1: stays opt-in
        return fused_gate("DIFF_VITS_FUSED_RELATTN", self.use_fused,
                          default=False)

    @nn.compact
    def __call__(self, x, c, attn_mask=None, *, deterministic: bool = True):
        k_channels = self.channels // self.n_heads

        if self._fused_enabled(deterministic, x is c):
            from diff_vits_tpu.ops import rel_attention as RA
            rel_stddev = k_channels ** -0.5
            wq, bq = _DenseParams(self.channels, name="conv_q")(x.shape[-1])
            wk, bk = _DenseParams(self.channels, name="conv_k")(x.shape[-1])
            wv, bv = _DenseParams(self.channels, name="conv_v")(x.shape[-1])
            emb_rel_k = self.param(
                "emb_rel_k", nn.initializers.normal(rel_stddev),
                (1, self.window_size * 2 + 1, k_channels))
            emb_rel_v = self.param(
                "emb_rel_v", nn.initializers.normal(rel_stddev),
                (1, self.window_size * 2 + 1, k_channels))
            wo, bo = _DenseParams(self.out_channels,
                                  name="conv_o")(self.channels)
            mask = None if attn_mask is None else attn_mask[:, 0]
            cdt = self.dtype
            return RA.fused_rel_self_attention(
                x, mask, wq.astype(cdt), bq, wk.astype(cdt), bk,
                wv.astype(cdt), bv, wo.astype(cdt), bo, emb_rel_k, emb_rel_v,
                heads=self.n_heads, window=self.window_size,
                compute_dtype=cdt)
        q = nn.Dense(self.channels, dtype=self.dtype, name="conv_q")(x)
        k = nn.Dense(self.channels, dtype=self.dtype, name="conv_k")(c)
        v = nn.Dense(self.channels, dtype=self.dtype, name="conv_v")(c)

        b, t_t, _ = q.shape
        t_s = k.shape[1]

        def split_heads(t):
            return t.reshape(b, -1, self.n_heads, k_channels).transpose(0, 2, 1, 3)

        qh, kh, vh = split_heads(q), split_heads(k), split_heads(v)

        scores = jnp.einsum("bhtd,bhsd->bhts", qh / math.sqrt(k_channels), kh)

        if self.window_size is not None:
            assert t_s == t_t, "Relative attention only for self-attention."
            n_heads_rel = 1 if self.heads_share else self.n_heads
            rel_stddev = k_channels ** -0.5
            emb_rel_k = self.param(
                "emb_rel_k",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, self.window_size * 2 + 1, k_channels))
            emb_rel_v = self.param(
                "emb_rel_v",
                nn.initializers.normal(rel_stddev),
                (n_heads_rel, self.window_size * 2 + 1, k_channels))
            key_band = _get_band_embeddings(emb_rel_k, t_s, self.window_size)
            # shared heads: one table broadcast over h; per-head tables
            # (heads_share=False) must match head h to table h — summing
            # over a general 'g' axis would mix all heads' embeddings
            rel_eq = ("bhtd,gmd->bhtm" if self.heads_share
                      else "bhtd,hmd->bhtm")
            band_logits = jnp.einsum(rel_eq, qh / math.sqrt(k_channels),
                                     key_band.astype(self.dtype))
            scores = scores + _band_to_abs(band_logits)

        if self.proximal_bias:
            r = jnp.arange(t_s, dtype=jnp.float32)
            diff = r[None, :] - r[:, None]
            scores = scores + (-jnp.log1p(jnp.abs(diff)))[None, None].astype(
                scores.dtype)

        if attn_mask is not None:
            scores = jnp.where(attn_mask == 0, -1e4, scores)
            if self.block_length is not None:
                band = jnp.tril(
                    jnp.triu(jnp.ones((t_t, t_s)), -self.block_length),
                    self.block_length)
                scores = jnp.where(band[None, None] == 0, -1e4, scores)

        p_attn = jax.nn.softmax(scores, axis=-1)
        p_attn = nn.Dropout(self.p_dropout, deterministic=deterministic)(p_attn)
        out = jnp.einsum("bhts,bhsd->bhtd", p_attn, vh)

        if self.window_size is not None:
            w_eff = min(self.window_size, t_s - 1)
            band_weights = _abs_to_band(p_attn, w_eff)
            value_band = _get_band_embeddings(emb_rel_v, t_s,
                                              self.window_size)
            out = out + jnp.einsum(
                "bhtm,gmd->bhtd" if self.heads_share else "bhtm,hmd->bhtd",
                band_weights, value_band.astype(self.dtype))

        out = out.transpose(0, 2, 1, 3).reshape(b, t_t, self.channels)
        return nn.Dense(self.out_channels, dtype=self.dtype, name="conv_o")(out)


class FFN(nn.Module):
    """Conv feed-forward with same/causal padding. Parity: attentions.py:298."""
    out_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float = 0.0
    activation: Optional[str] = None
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    def _pad(self, x):
        if self.kernel_size == 1:
            return x
        if self.causal:
            return jnp.pad(x, ((0, 0), (self.kernel_size - 1, 0), (0, 0)))
        pad_l = (self.kernel_size - 1) // 2
        pad_r = self.kernel_size // 2
        return jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))

    @nn.compact
    def __call__(self, x, x_mask, *, deterministic: bool = True):
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="VALID",
                    dtype=self.dtype, name="conv_1")(self._pad(x * x_mask))
        if self.activation == "gelu":
            x = x * jax.nn.sigmoid(1.702 * x)
        else:
            x = nn.relu(x)
        x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = nn.Conv(self.out_channels, (self.kernel_size,), padding="VALID",
                    dtype=self.dtype, name="conv_2")(self._pad(x * x_mask))
        return x * x_mask


class Encoder(nn.Module):
    """Relative-position transformer encoder (VITS style).

    Parity: attentions.py:37 — post-LN residual blocks, speaker embedding
    added before layer ``cond_layer_idx`` (vits2 style, attentions.py:75-79).
    """
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    window_size: int = 4
    gin_channels: int = 0
    cond_layer_idx: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, *, deterministic: bool = True):
        attn_mask = x_mask[:, None, :, 0][:, :, None, :] * \
            x_mask[:, None, :, 0][:, :, :, None]
        # -> [B, 1, T, T] mask for scores [B, H, Tq, Tk]
        x = x * x_mask
        for i in range(self.n_layers):
            if i == self.cond_layer_idx and g is not None and self.gin_channels != 0:
                g_emb = nn.Dense(self.hidden_channels, dtype=self.dtype,
                                 name="spk_emb_linear")(g)
                x = (x + g_emb) * x_mask
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, window_size=self.window_size,
                dtype=self.dtype, name=f"attn_{i}")(
                    x, x, attn_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm1_{i}")(x + y)
            y = FFN(self.hidden_channels, self.filter_channels,
                    self.kernel_size, p_dropout=self.p_dropout,
                    dtype=self.dtype, name=f"ffn_{i}")(
                        x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm2_{i}")(x + y)
        return x * x_mask


class Decoder(nn.Module):
    """Causal transformer decoder with enc-dec attention.

    Parity: attentions.py:91 (unused in the active path; kept for capability
    parity).
    """
    hidden_channels: int
    filter_channels: int
    n_heads: int
    n_layers: int
    kernel_size: int = 1
    p_dropout: float = 0.0
    proximal_bias: bool = False
    proximal_init: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, h, h_mask, *, deterministic: bool = True):
        t = x.shape[1]
        self_attn_mask = jnp.tril(jnp.ones((t, t)))[None, None]
        encdec_mask = h_mask[:, None, :, 0][:, :, None, :] * \
            x_mask[:, None, :, 0][:, :, :, None]
        x = x * x_mask
        for i in range(self.n_layers):
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, proximal_bias=self.proximal_bias,
                proximal_init=self.proximal_init, dtype=self.dtype,
                name=f"self_attn_{i}")(x, x, self_attn_mask,
                                       deterministic=deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm0_{i}")(x + y)
            y = MultiHeadAttention(
                self.hidden_channels, self.hidden_channels, self.n_heads,
                p_dropout=self.p_dropout, dtype=self.dtype,
                name=f"encdec_attn_{i}")(x, h, encdec_mask,
                                         deterministic=deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm1_{i}")(x + y)
            y = FFN(self.hidden_channels, self.filter_channels,
                    self.kernel_size, p_dropout=self.p_dropout, causal=True,
                    dtype=self.dtype, name=f"ffn_{i}")(
                        x, x_mask, deterministic=deterministic)
            y = nn.Dropout(self.p_dropout, deterministic=deterministic)(y)
            x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name=f"norm2_{i}")(x + y)
        return x * x_mask
