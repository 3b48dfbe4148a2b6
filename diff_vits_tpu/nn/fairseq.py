"""Fairseq-style encoder layers (the PromptEncoder backbone), channel-last.

Capability parity with the reference's T x B x C stack (operations.py /
model.py): ``ConvLayer`` (model.py:153), ``EncConvLayer`` (model.py:173),
``TransformerFFNLayer`` (operations.py:644) and ``EncSALayer``
(operations.py:784, registry code 8 = 8 heads, ffn kernel 9, SAME padding,
no qkv bias). Our layout is [B, T, C]; time-major TBC plus torch.conv_tbc is
a GPU-era artifact — on TPU a plain NTC conv lowers to the same MXU matmuls.

Padding-mask convention here: float keep-mask [B, T, 1] (1 = valid), the
complement of the reference's bool pad-mask.
"""
from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


def sinusoidal_positional_embedding(positions: jax.Array, embedding_dim: int,
                                    padding_idx: int = 0) -> jax.Array:
    """tensor2tensor-style sinusoidal position table lookup
    (operations.py:200-262, ``SinusoidalPositionalEmbedding``).

    ``positions`` are int ids [B, T] where ``padding_idx`` rows embed to
    zero; non-pad tokens use position ``padding_idx + 1 + index`` exactly as
    the reference's ``make_positions``.
    """
    half_dim = embedding_dim // 2
    freq = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32)
                   * -(math.log(10000.0) / (half_dim - 1)))
    args = positions.astype(jnp.float32)[..., None] * freq
    emb = jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)
    if embedding_dim % 2 == 1:
        emb = jnp.pad(emb, [(0, 0)] * (emb.ndim - 1) + [(0, 1)])
    return jnp.where((positions == padding_idx)[..., None], 0.0, emb)


class SinusoidalPositionalEmbedding(nn.Module):
    """Padding-aware sinusoidal positions for a token batch
    (operations.py:200). Input [B, T] token ids; pads embed to zero."""
    embedding_dim: int
    padding_idx: int = 0

    def __call__(self, tokens):
        nonpad = (tokens != self.padding_idx).astype(jnp.int32)
        positions = jnp.cumsum(nonpad, axis=1) * nonpad + self.padding_idx
        return sinusoidal_positional_embedding(
            positions, self.embedding_dim, self.padding_idx)


def init_kv_cache(batch: int, max_len: int, num_heads: int, head_dim: int,
                  dtype=jnp.float32):
    """Fixed-size decode cache — the JAX-native equivalent of fairseq
    ``MultiheadAttention``'s ``saved_state`` incremental KV reuse
    (operations.py:304,432-470). Static shapes keep the step jittable."""
    shape = (batch, num_heads, max_len, head_dim)
    return {"k": jnp.zeros(shape, dtype), "v": jnp.zeros(shape, dtype),
            "index": jnp.zeros((), jnp.int32)}


def incremental_attention_step(q_t, k_t, v_t, cache):
    """One autoregressive decode step with cached keys/values.

    q_t/k_t/v_t: [B, H, 1, D] projections of the new token. Appends k/v at
    ``cache['index']`` and attends the single query over all cached
    positions (prefix-causal — identical to fairseq's incremental decode,
    operations.py:432-470). Returns (out [B, H, 1, D], new_cache).
    """
    idx = cache["index"]
    k = jax.lax.dynamic_update_slice_in_dim(cache["k"], k_t, idx, axis=2)
    v = jax.lax.dynamic_update_slice_in_dim(cache["v"], v_t, idx, axis=2)
    scale = q_t.shape[-1] ** -0.5
    scores = jnp.einsum("bhqd,bhsd->bhqs", q_t * scale, k)
    pos = jnp.arange(k.shape[2])[None, None, None, :]
    scores = jnp.where(pos > idx, -jnp.inf, scores)
    p = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqs,bhsd->bhqd", p, v)
    return out, {"k": k, "v": v, "index": idx + 1}


class ConvLayer(nn.Module):
    """LN -> conv(k). Parity: model.py:153 (ConvLayer = LayerNorm + ConvTBC)."""
    c_out: int
    kernel_size: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, keep_mask=None, *, deterministic: bool = True):
        if keep_mask is not None:
            x = x * keep_mask
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        # torch.conv_tbc pads symmetrically with k//2 on both sides; for even
        # k this differs from SAME — replicate exactly.
        pad = self.kernel_size // 2
        x = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        x = nn.Conv(self.c_out, (self.kernel_size,), padding="VALID",
                    dtype=self.dtype, name="conv")(x)
        if self.kernel_size % 2 == 0:
            x = x[:, :-1]
        return x


class EncConvLayer(nn.Module):
    """Residual LN->conv->relu->dropout block. Parity: model.py:173."""
    kernel_size: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, keep_mask=None, *, deterministic: bool = True):
        residual = x
        if keep_mask is not None:
            x = x * keep_mask
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)
        pad = self.kernel_size // 2
        h = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        h = nn.Conv(x.shape[-1], (self.kernel_size,), padding="VALID",
                    dtype=self.dtype, name="conv")(h)
        if self.kernel_size % 2 == 0:
            h = h[:, :-1]
        h = nn.relu(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return h + residual


class TransformerFFNLayer(nn.Module):
    """Shifted-linear conv FFN. Parity: operations.py:644.

    The reference emulates a width-k conv with k shifted Linear layers (only
    the first has a bias) summed and scaled by k^-0.5. Functionally that IS a
    conv with SAME padding and scaled output — we implement it as one conv,
    which XLA maps onto a single MXU matmul chain.
    """
    filter_size: int
    hidden_size: int
    kernel_size: int = 1
    padding: str = "SAME"
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.kernel_size == 1:
            x = nn.Dense(self.filter_size, dtype=self.dtype, name="ffn_1")(x)
        else:
            if self.padding == "SAME":
                pad_l = (self.kernel_size - 1) // 2
                pad_r = self.kernel_size - 1 - pad_l
            else:  # LEFT (causal)
                pad_l, pad_r = self.kernel_size - 1, 0
            h = jnp.pad(x, ((0, 0), (pad_l, pad_r), (0, 0)))
            x = nn.Conv(self.filter_size, (self.kernel_size,), padding="VALID",
                        dtype=self.dtype, name="ffn_1")(h)
            x = x * self.kernel_size ** -0.5
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=deterministic)(x)
        return nn.Dense(self.hidden_size, dtype=self.dtype, name="ffn_2")(x)


class EncSALayer(nn.Module):
    """Pre-LN self-attention + conv-FFN block. Parity: operations.py:784.

    Registry code 8 (operations.py:960): 8 heads, attention_dropout 0,
    relu_dropout = dropout, ffn kernel 9, SAME.
    """
    num_heads: int
    dropout: float
    attention_dropout: float = 0.0
    relu_dropout: float = 0.1
    kernel_size: int = 9
    ffn_padding: str = "SAME"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, keep_mask, *, deterministic: bool = True):
        c = x.shape[-1]
        head_dim = c // self.num_heads

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        # fairseq MultiheadAttention (bias=False), standard softmax attention
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype,
                       name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t, _ = q.shape

        def split_heads(t_):
            return t_.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh = split_heads(q)
        kh, vh = split_heads(k), split_heads(v)
        from diff_vits_tpu.ops import flash_attention as FLA
        if self.attention_dropout == 0.0 and \
                FLA.flash_ok(qh.shape, kh.shape):
            # registry code 8 sets attention_dropout 0 (operations.py:960),
            # so the TPU flash kernel is math-identical here
            out = FLA.sdpa(qh, kh, vh, keep_mask[:, :, 0] > 0,
                           sm_scale=head_dim ** -0.5)
        else:
            scores = jnp.einsum("bhtd,bhsd->bhts",
                                qh * head_dim ** -0.5, kh)
            # key padding: -inf on padded keys (fairseq masked_fill -inf)
            pad = (keep_mask[:, None, None, :, 0] == 0)
            scores = jnp.where(pad, -jnp.inf, scores)
            p = jax.nn.softmax(scores, axis=-1)
            p = nn.Dropout(self.attention_dropout,
                           deterministic=deterministic)(p)
            out = jnp.einsum("bhts,bhsd->bhtd", p, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        out = nn.Dense(c, use_bias=False, dtype=self.dtype,
                       name="out_proj")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        x = (residual + out) * keep_mask

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = TransformerFFNLayer(4 * c, c, kernel_size=self.kernel_size,
                                padding=self.ffn_padding,
                                dropout=self.relu_dropout, dtype=self.dtype,
                                name="ffn")(h, deterministic=deterministic)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return (residual + h) * keep_mask


class EncLocalSALayer(nn.Module):
    """Chunked local self-attention block (window 101).

    Capability parity: operations.py:824-879 (registry code 11 — the only
    sub-quadratic attention in the reference, unused by the active path).
    Implemented as full attention with a banded additive mask: for the
    sequence lengths involved (<= ~2k frames) the banded O(T^2) masked form
    is faster on the MXU than gather-based chunking; a Pallas block-local
    kernel can slot in here for long-context scaling.
    """
    num_heads: int
    dropout: float
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    chunk_size: int = 101
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, keep_mask, *, deterministic: bool = True):
        c = x.shape[-1]
        head_dim = c // self.num_heads
        half = self.chunk_size // 2

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        qkv = nn.Dense(3 * c, use_bias=False, dtype=self.dtype,
                       name="in_proj")(h)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        b, t, _ = q.shape

        def split_heads(t_):
            return t_.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh = split_heads(q) * head_dim ** -0.5
        kh, vh = split_heads(k), split_heads(v)
        scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh)
        pos = jnp.arange(t)
        band = jnp.abs(pos[:, None] - pos[None, :]) <= half
        scores = jnp.where(band[None, None], scores, -1e9)
        pad = (keep_mask[:, None, None, :, 0] == 0)
        scores = jnp.where(pad, -1e9, scores)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.attention_dropout, deterministic=deterministic)(p)
        out = jnp.einsum("bhts,bhsd->bhtd", p, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        out = nn.Dense(c, use_bias=False, dtype=self.dtype,
                       name="out_proj")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        x = (residual + out) * keep_mask

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = TransformerFFNLayer(4 * c, c, kernel_size=9,
                                dropout=self.relu_dropout, dtype=self.dtype,
                                name="ffn")(h, deterministic=deterministic)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return (residual + h) * keep_mask


class EncGausSALayer(nn.Module):
    """Gaussian-bias self-attention block. Parity: operations.py:115-147
    (``EncGausSALayer``) + ``SelfAttention`` (operations.py:29-112).

    Per-head learnable temperature ``tao``; attention scores get an additive
    locality prior ``-(i-j)^2/2 * tao^-4``. Registry code 13
    (operations.py:969) instantiates it single-head. The reference
    pre-builds a 3000x3000 bias matrix on host; here the bias is computed
    inline from a broadcasted iota and fused by XLA.
    """
    num_heads: int = 1
    dropout: float = 0.0
    attention_dropout: float = 0.1
    relu_dropout: float = 0.1
    gaus_bias: bool = False
    gaus_tao: float = 10.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, keep_mask, *, deterministic: bool = True):
        c = x.shape[-1]
        head_dim = c // self.num_heads

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm1")(x)
        q = nn.Dense(c, dtype=self.dtype, name="w_q")(h)
        k = nn.Dense(c, dtype=self.dtype, name="w_k")(h)
        v = nn.Dense(c, dtype=self.dtype, name="w_v")(h)
        b, t, _ = q.shape

        def split_heads(t_):
            return t_.reshape(b, t, self.num_heads, head_dim).transpose(0, 2, 1, 3)

        qh = split_heads(q) * head_dim ** -0.5
        kh, vh = split_heads(k), split_heads(v)
        scores = jnp.einsum("bhtd,bhsd->bhts", qh, kh)
        if self.gaus_bias:
            tao = self.param("tao", lambda _k: jnp.full(
                (self.num_heads,), self.gaus_tao, jnp.float32))
            i = jnp.arange(t, dtype=jnp.float32)
            gauss = -((i[None, :] - i[:, None]) ** 2) / 2.0  # [Tq, Tk]
            scores = scores + (gauss[None, None]
                               * (tao ** -4.0)[None, :, None, None])
        pad = (keep_mask[:, None, None, :, 0] == 0)
        scores = jnp.where(pad, -jnp.inf, scores)
        p = jax.nn.softmax(scores, axis=-1)
        p = nn.Dropout(self.attention_dropout, deterministic=deterministic)(p)
        out = jnp.einsum("bhts,bhsd->bhtd", p, vh)
        out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        out = nn.Dense(c, dtype=self.dtype, name="fc")(out)
        out = nn.Dropout(self.dropout, deterministic=deterministic)(out)
        # NOTE: unlike EncSALayer, the reference never re-masks the residual
        # stream here (operations.py:126-147) — padded rows flow into valid
        # ones through the width-9 FFN conv; kept for exact parity
        x = residual + out

        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm2")(x)
        h = TransformerFFNLayer(4 * c, c, kernel_size=9,
                                dropout=self.relu_dropout, dtype=self.dtype,
                                name="ffn")(h, deterministic=deterministic)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        return residual + h


class EncLSTMLayer(nn.Module):
    """Bi-LSTM residual block. Capability parity: operations.py:882-903
    (registry code 12). The recurrence runs as two ``lax.scan`` passes."""
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, keep_mask=None, *, deterministic: bool = True):
        c = x.shape[-1]
        residual = x
        h = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="layer_norm")(x)

        fwd_cell = nn.OptimizedLSTMCell(c, dtype=self.dtype, name="lstm_fwd")
        bwd_cell = nn.OptimizedLSTMCell(c, dtype=self.dtype, name="lstm_bwd")
        rnn_f = nn.RNN(fwd_cell, name="rnn_fwd")
        rnn_b = nn.RNN(bwd_cell, reverse=True, keep_order=True, name="rnn_bwd")
        hf = rnn_f(h)
        hb = rnn_b(h)
        h = jnp.concatenate([hf, hb], axis=-1)
        h = nn.Dense(c, dtype=self.dtype, name="out_proj")(h)
        h = nn.Dropout(self.dropout, deterministic=deterministic)(h)
        out = residual + h
        if keep_mask is not None:
            out = out * keep_mask
        return out


class ConvAttentionLayer(nn.Module):
    """Single-head enc-dec dot-product attention with length-aware output
    scaling. Parity: operations.py:905-951 (fairseq convolutional-seq2seq
    attention; unused by the active path). Inputs are [B, T, C]
    (batch-major, vs the reference's T-major)."""
    hidden_size: int
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, key, value, key_keep_mask=None,
                 attn_constraint_mask=None, *, deterministic: bool = True):
        c = x.shape[-1]
        q = nn.Dense(self.hidden_size, dtype=self.dtype,
                     name="in_projection")(x)
        scores = jnp.einsum("btd,bsd->bts", q, key)
        if key_keep_mask is not None:
            scores = jnp.where(key_keep_mask[:, None, :], scores, -jnp.inf)
        if attn_constraint_mask is not None:
            scores = jnp.where(attn_constraint_mask, -jnp.inf, scores)
        logits = scores
        p = jax.nn.softmax(scores, axis=-1)
        p = jnp.where(jnp.isnan(p), 0.0, p)
        p = nn.Dropout(self.dropout, deterministic=deterministic)(p)
        out = jnp.einsum("bts,bsd->btd", p, value)
        # scale by sqrt(#unmasked source positions) (operations.py:941-946)
        s = value.shape[1]
        if key_keep_mask is None:
            out = out * (s * math.sqrt(1.0 / s))
        else:
            n = jnp.sum(key_keep_mask.astype(out.dtype), axis=1)[:, None, None]
            out = out * jnp.sqrt(jnp.maximum(n, 1.0))
        out = nn.Dense(c, dtype=self.dtype, name="out_projection")(out)
        return out, p, logits


OPERATIONS_ENCODER = {
    # registry parity: operations.py:953-971 (c = hidden size)
    1: lambda c, dropout, dtype=jnp.float32: EncConvLayer(1, dropout, dtype=dtype),
    2: lambda c, dropout, dtype=jnp.float32: EncConvLayer(5, dropout, dtype=dtype),
    3: lambda c, dropout, dtype=jnp.float32: EncConvLayer(9, dropout, dtype=dtype),
    4: lambda c, dropout, dtype=jnp.float32: EncConvLayer(13, dropout, dtype=dtype),
    5: lambda c, dropout, dtype=jnp.float32: EncConvLayer(17, dropout, dtype=dtype),
    6: lambda c, dropout, dtype=jnp.float32: EncConvLayer(21, dropout, dtype=dtype),
    7: lambda c, dropout, dtype=jnp.float32: EncConvLayer(25, dropout, dtype=dtype),
    8: lambda c, dropout, dtype=jnp.float32: EncSALayer(
        8, dropout, attention_dropout=0.0, relu_dropout=dropout,
        kernel_size=9, ffn_padding="SAME", dtype=dtype),
    9: lambda c, dropout, dtype=jnp.float32: EncSALayer(4, dropout, dtype=dtype),
    10: lambda c, dropout, dtype=jnp.float32: EncSALayer(8, dropout, dtype=dtype),
    11: lambda c, dropout, dtype=jnp.float32: EncLocalSALayer(2, dropout, dtype=dtype),
    12: lambda c, dropout, dtype=jnp.float32: EncLSTMLayer(dropout, dtype=dtype),
    13: lambda c, dropout, dtype=jnp.float32, g_bias=True, tao=10.0:
        EncGausSALayer(1, dropout, gaus_bias=g_bias, gaus_tao=tao,
                       dtype=dtype),
    14: lambda c, dropout, dtype=jnp.float32: EncSALayer(2, dropout, kernel_size=1, dtype=dtype),
    15: lambda c, dropout, dtype=jnp.float32: EncSALayer(2, dropout, kernel_size=15, dtype=dtype),
}
