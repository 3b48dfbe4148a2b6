"""Duration predictors: UNet-conditioned (active), classic conv, stochastic.

Parity: ``DurationPredictor_unet`` (model3.py:275-319, the active dp),
``DurationPredictor`` (model3.py:233-273), ``StochasticDurationPredictor``
(model3.py:122-230). Gradient cuts follow the reference: dp inputs are
``stop_gradient``-ed (model3.py:306-307).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.core import masking
from diff_vits_tpu.nn.flows import ConvFlow, ElementwiseAffine, Flip, Log
from diff_vits_tpu.nn.layers import DDSConv
from diff_vits_tpu.nn.unet1d import UNet1DConditionModel


class DurationPredictorUNet(nn.Module):
    """Text hidden + mel prompt -> UNet1D (t=1) -> log durations.

    Parity: model3.py:275-319 — block_out = (h/4, h/4, h/2, h/2), groups 8,
    cross-attn dim = hidden, heads 8, 'text' additive embedding,
    scale_shift FiLM, timestep fixed to 1.
    """
    in_channels: int
    hidden_channels: int
    prompt_channels: int
    kernel_size: int = 3
    p_dropout: float = 0.5
    out_channels: int = 1
    n_heads: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_lengths, prompt, prompt_lengths, *,
                 deterministic: bool = True):
        x = jax.lax.stop_gradient(x)
        prompt = jax.lax.stop_gradient(prompt)
        h = self.hidden_channels
        prompt = nn.Dense(h, dtype=self.dtype, name="prompt_proj")(prompt)
        x_mask = masking.sequence_mask(x_lengths, x.shape[1]).astype(
            x.dtype)[..., None]
        prompt_keep = masking.sequence_mask(prompt_lengths, prompt.shape[1])
        prompt = prompt * prompt_keep.astype(prompt.dtype)[..., None]
        x = nn.Dense(h, dtype=self.dtype, name="pre")(x) * x_mask
        out = UNet1DConditionModel(
            in_channels=self.in_channels, out_channels=self.out_channels,
            block_out_channels=(h // 4, h // 4, h // 2, h // 2),
            norm_num_groups=8, cross_attention_dim=h,
            attention_head_dim=self.n_heads, addition_embed_type="text",
            resnet_time_scale_shift="scale_shift", dtype=self.dtype,
            name="enc")(x, jnp.ones((), jnp.int32), prompt,
                        encoder_attention_mask=prompt_keep,
                        deterministic=deterministic)
        return out * x_mask


class DurationPredictor(nn.Module):
    """Classic VITS conv duration predictor. Parity: model3.py:233-273."""
    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, g=None, *, deterministic: bool = True):
        x = jax.lax.stop_gradient(x)
        if g is not None and self.gin_channels != 0:
            g = jax.lax.stop_gradient(g)
            x = x + nn.Dense(self.in_channels, dtype=self.dtype,
                             name="cond")(g)
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="conv_1")(x * x_mask)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_1")(x)
        x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = nn.Conv(self.filter_channels, (self.kernel_size,), padding="SAME",
                    dtype=self.dtype, name="conv_2")(x * x_mask)
        x = nn.relu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm_2")(x)
        x = nn.Dropout(self.p_dropout, deterministic=deterministic)(x)
        x = nn.Dense(1, dtype=self.dtype, name="proj")(x * x_mask)
        return x * x_mask


class StochasticDurationPredictor(nn.Module):
    """Flow-based duration predictor. Parity: model3.py:122-230.

    forward (reverse=False) returns the duration NLL; reverse samples logw.
    """
    in_channels: int
    filter_channels: int
    kernel_size: int
    p_dropout: float
    n_flows: int = 4
    gin_channels: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, x_mask, w=None, g=None, reverse: bool = False,
                 noise_scale: float = 1.0, *, rng_key=None,
                 deterministic: bool = True):
        filter_channels = self.in_channels  # reference quirk (model3.py:133)
        x = jax.lax.stop_gradient(x)
        x = nn.Dense(filter_channels, dtype=self.dtype, name="pre")(x)
        if g is not None and self.gin_channels != 0:
            g = jax.lax.stop_gradient(g)
            x = x + nn.Dense(filter_channels, dtype=self.dtype, name="cond")(g)
        x = DDSConv(filter_channels, self.kernel_size, 3,
                    p_dropout=self.p_dropout, dtype=self.dtype,
                    name="convs")(x, x_mask, deterministic=deterministic)
        x = nn.Dense(filter_channels, dtype=self.dtype,
                     name="proj")(x) * x_mask

        flows = [ElementwiseAffine(2, name="flow_pre")]
        for i in range(self.n_flows):
            flows.append(ConvFlow(2, filter_channels, self.kernel_size, 3,
                                  dtype=self.dtype, name=f"flow_{i}"))
            flows.append(Flip(name=f"flow_flip_{i}"))

        if not reverse:
            assert w is not None and rng_key is not None
            log_flow = Log(name="log_flow")
            # posterior flow over (u, v)
            h_w = nn.Dense(filter_channels, dtype=self.dtype,
                           name="post_pre")(w)
            h_w = DDSConv(filter_channels, self.kernel_size, 3,
                          p_dropout=self.p_dropout, dtype=self.dtype,
                          name="post_convs")(h_w, x_mask,
                                             deterministic=deterministic)
            h_w = nn.Dense(filter_channels, dtype=self.dtype,
                           name="post_proj")(h_w) * x_mask
            key_q, = jax.random.split(rng_key, 1)
            e_q = jax.random.normal(
                key_q, (w.shape[0], w.shape[1], 2), w.dtype) * x_mask
            z_q = e_q
            logdet_tot_q = 0.0
            post_flows = [ElementwiseAffine(2, name="post_flow_pre")]
            for i in range(4):
                post_flows.append(ConvFlow(2, filter_channels,
                                           self.kernel_size, 3,
                                           dtype=self.dtype,
                                           name=f"post_flow_{i}"))
                post_flows.append(Flip(name=f"post_flow_flip_{i}"))
            for flow in post_flows:
                z_q, logdet_q = flow(z_q, x_mask, g=(x + h_w))
                logdet_tot_q += logdet_q
            z_u, z1 = z_q[..., :1], z_q[..., 1:]
            u = jax.nn.sigmoid(z_u) * x_mask
            z0 = (w - u) * x_mask
            logdet_tot_q += jnp.sum(
                (jax.nn.log_sigmoid(z_u) + jax.nn.log_sigmoid(-z_u)) * x_mask,
                axis=(1, 2))
            logq = jnp.sum(
                -0.5 * (jnp.log(2 * jnp.pi) + e_q ** 2) * x_mask,
                axis=(1, 2)) - logdet_tot_q

            logdet_tot = 0.0
            z0, logdet = log_flow(z0, x_mask)
            logdet_tot += logdet
            z = jnp.concatenate([z0, z1], axis=-1)
            for flow in flows:
                z, logdet = flow(z, x_mask, g=x)
                logdet_tot += logdet
            nll = jnp.sum(0.5 * (jnp.log(2 * jnp.pi) + z ** 2) * x_mask,
                          axis=(1, 2)) - logdet_tot
            return nll + logq
        # reverse: sample
        assert rng_key is not None
        # drop the last Flip (reference removes the vestigial flow,
        # model3.py:221)
        rev_flows = list(reversed(flows))
        rev_flows = rev_flows[:-2] + [rev_flows[-1]]
        z = jax.random.normal(
            rng_key, (x.shape[0], x.shape[1], 2), x.dtype) * noise_scale
        for flow in rev_flows:
            z = flow(z, x_mask, g=x, reverse=True)
        z0 = z[..., :1]
        return z0
