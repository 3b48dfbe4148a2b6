"""Top-level zero-shot TTS model: VITS prior + conditional diffusion decoder.

Parity: ``NaturalSpeech2`` (model3.py:954-1255): DDPM buffers, q_sample
forward-noising, x0-prediction training objective with SNR loss weights and
the 40x diffusion loss weight (model3.py:1252), plus the sampling entry
points (DDPM / DDIM / DPM-Solver++ / UniPC) that share the VITS.infer
content path (model3.py:1121-1203).

The module is pure: all randomness comes in through explicit keys, the
refer1/refer2 coin flip (model3.py:1231-1234) is taken by the caller (the
Trainer) so batch shapes stay static, and the MAS noise scale is an input
(the reference threads it through a module-global ``step``,
model3.py:1214-1220).
"""
from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from diff_vits_tpu.core import masking
from diff_vits_tpu.core.config import Config
from diff_vits_tpu.diffusion.noise_schedule import NoiseScheduleVP
from diff_vits_tpu.diffusion.schedule import GaussianDiffusion
from diff_vits_tpu.diffusion.dpm_solver import sample_dpmpp
from diff_vits_tpu.diffusion.uni_pc import sample_unipc
from diff_vits_tpu.models.diffusion_encoder import DiffusionEncoder
from diff_vits_tpu.models.vits import VITS


class DiffVits(nn.Module):
    cfg: Config
    n_vocab: int
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        self.vits = VITS(self.n_vocab, self.cfg.vits, dtype=self.dtype)
        self.diff_model = DiffusionEncoder(self.cfg.diffusion_encoder,
                                           dtype=self.dtype)

    # -- single denoiser call (used by the samplers through apply) ---------

    def denoise(self, x, t, cond, refer, lengths, refer_lengths, *,
                deterministic: bool = True):
        return self.diff_model(x, t, cond, refer, lengths, refer_lengths,
                               deterministic=deterministic)

    def encode_prompt(self, refer, refer_lengths, *,
                      deterministic: bool = True):
        return self.diff_model.encode_prompt(refer, refer_lengths,
                                             deterministic=deterministic)

    def denoise_cached(self, x, t, cond, prompt_h, prompt_keep, *, emb=None,
                       deterministic: bool = True):
        return self.diff_model.denoise(x, t, cond, prompt_h, prompt_keep,
                                       emb=emb, deterministic=deterministic)

    def embed_time(self, timesteps):
        return self.diff_model.embed_time(timesteps)

    def embed_text(self, prompt_h):
        return self.diff_model.embed_text(prompt_h)

    def vits_infer(self, text, text_lengths, refer, refer_lengths, tone,
                   language, *, noise_key, noise_scale=0.667,
                   length_scale=1.0, max_len=None,
                   deterministic: bool = True):
        return self.vits.infer(text, text_lengths, refer, refer_lengths,
                               tone, language, noise_key=noise_key,
                               noise_scale=noise_scale,
                               length_scale=length_scale, max_len=max_len,
                               deterministic=deterministic)

    def predict_lengths(self, text, text_lengths, refer, refer_lengths,
                        tone, language, *, noise_key, length_scale=1.0,
                        deterministic: bool = True):
        """Predicted mel frame counts [B] (duration pass only); lets the
        serving driver pick a mel-length bucket before synthesis."""
        return self.vits.predict_lengths(
            text, text_lengths, refer, refer_lengths, tone, language,
            noise_key=noise_key, length_scale=length_scale,
            deterministic=deterministic)

    # -- training forward ---------------------------------------------------

    def __call__(self, text, text_lengths, spec, spec_lengths, refer,
                 refer_lengths, tone, language, *, rng=None,
                 mas_noise_scale=0.0, t=None, noise=None,
                 deterministic: bool = True):
        """Training forward. Parity: model3.py:1213-1255.

        Args (all channel-last):
          text/tone/language: [B, Tx] int32.
          spec: [B, Ty, 100] ground-truth log-mel.
          refer: [B, S, 100] prompt mel (caller picks refer1 or refer2).
          rng: PRNG key for posterior noise, MAS noise, t, diffusion noise.
            May be None when both ``t`` and ``noise`` are injected — then
            posterior/MAS noise is zero (deterministic-parity mode).
          t: optional [B] int32 diffusion timesteps (injected override).
          noise: optional [B, Ty, 100] q_sample noise (injected override).
        Returns:
          (loss, metrics dict)
        """
        gd = GaussianDiffusion.create(
            self.cfg.train.timesteps)
        if rng is not None:
            k_vits, k_t, k_noise = jax.random.split(rng, 3)
        else:
            if t is None or noise is None:
                raise ValueError("rng=None requires injected t and noise")
            k_vits = k_t = k_noise = None

        content, lengths, (l_length, loss_kl, loss_kl_ph) = self.vits(
            text, text_lengths, spec, spec_lengths, tone, language,
            mas_noise_scale=mas_noise_scale, rngs_noise_key=k_vits,
            deterministic=deterministic)

        b = spec.shape[0]
        if t is None:
            t = jax.random.randint(k_t, (b,), 0, gd.num_timesteps)
        x_mask = masking.sequence_mask(lengths, content.shape[1]).astype(
            spec.dtype)[..., None]
        x_start = spec * x_mask
        if noise is None:
            noise = jax.random.normal(k_noise, x_start.shape, x_start.dtype)
        noise = noise * x_mask
        x = gd.q_sample(x_start, t, noise)

        model_out = self.diff_model(x, t, content, refer, lengths,
                                    refer_lengths,
                                    deterministic=deterministic)
        target = x_start
        mse = (model_out.astype(jnp.float32)
               - target.astype(jnp.float32)) ** 2
        loss_diff = mse.reshape(b, -1).mean(axis=-1)
        loss_diff = loss_diff * gd.loss_weight[t]
        loss_diff = loss_diff.mean()

        # loss = 40*diff + dur + kl (+ kl_ph for the bv2 variant)
        # (model3.py:1252 / bv2 forward)
        loss = 40.0 * loss_diff + l_length + loss_kl + loss_kl_ph
        metrics = {
            "loss/diff": loss_diff,
            "loss/len": l_length,
            "loss/kl": loss_kl,
            "loss/kl_ph": loss_kl_ph,
            "loss/all": loss,
        }
        return loss, (metrics, model_out, target)


# ---------------------------------------------------------------------------
# Sampling (pure functions over params; the solver loop re-enters apply)
# ---------------------------------------------------------------------------

def synthesize(
    model: DiffVits,
    params,
    text, text_lengths, refer, refer_lengths, tone, language,
    key,
    sampling_steps: int = 30,
    sample_method: str = "unipc",
    max_len: Optional[int] = None,
    noise_scale: float = 0.667,
    length_scale: float = 1.0,
    init_noise: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """text + prompt-mel -> mel. Parity: model3.py:1121-1203 (`sample`).

    ``init_noise`` optionally injects the initial diffusion state x_T
    [B, Ty, C] (for fixed-seed golden comparison against the reference —
    PRNG streams can't match across frameworks, so noise is an input).

    Returns (mel [B, Ty, 100], out_lengths [B]).
    """
    k_prior, k_init = jax.random.split(key)
    content, out_lengths = model.apply(
        params, text, text_lengths, refer, refer_lengths, tone, language,
        noise_key=k_prior, noise_scale=noise_scale,
        length_scale=length_scale, max_len=max_len,
        method=DiffVits.vits_infer)

    # pure-numpy schedule construction: synthesize may itself be jitted, and
    # jnp constants created inside a trace are tracers (jax>=0.9) which the
    # schedule's host-side table build can't consume
    from diff_vits_tpu.diffusion.schedule import linear_beta_schedule
    ns = NoiseScheduleVP(linear_beta_schedule(model.cfg.train.timesteps))
    b, t_y = content.shape[0], content.shape[1]
    c_mel = model.cfg.diffusion_encoder.out_channels
    if init_noise is not None:
        x = init_noise.astype(jnp.float32)
    else:
        x = jax.random.normal(k_init, (b, t_y, c_mel), jnp.float32)

    # encode the prompt once; the solver loop reuses the cross-attn keys
    # (the reference re-runs the prompt encoder in all ~31 calls)
    prompt_h, prompt_keep = model.apply(
        params, refer, refer_lengths, method=DiffVits.encode_prompt)

    # hoist the step-invariant UNet conditioning out of the solver loop:
    # the time grid is static, so every step's time+text embedding is
    # computed here in one batched call (the reference recomputes both in
    # each of its ~31 UNet calls, model3.py:902-914)
    from diff_vits_tpu.diffusion.dpm_solver import time_steps_uniform
    if sample_method in ("unipc", "dpmsolver"):
        ts_grid = time_steps_uniform(ns, sampling_steps)
        td_grid = ts_grid * ns.total_N - 1.0
        time_embs = model.apply(params, td_grid, method=DiffVits.embed_time)
        aug = model.apply(params, prompt_h, method=DiffVits.embed_text)
        emb_all = (time_embs[:, None, :].astype(jnp.float32)
                   + aug[None, :, :].astype(jnp.float32))
    else:
        emb_all = None

    def x0_fn(x, t_discrete, step_index=None):
        emb = None if emb_all is None or step_index is None \
            else emb_all[step_index]
        return model.apply(params, x, t_discrete, content, prompt_h,
                           prompt_keep, emb=emb,
                           method=DiffVits.denoise_cached)

    if sample_method == "unipc":
        mel = sample_unipc(x0_fn, ns, x, steps=sampling_steps, order=2)
    elif sample_method == "dpmsolver":
        mel = sample_dpmpp(x0_fn, ns, x, steps=sampling_steps, order=2)
    elif sample_method == "ddim":
        gd = GaussianDiffusion.create(model.cfg.train.timesteps)
        mel = gd.ddim_sample(x0_fn, x.shape, k_init, steps=sampling_steps,
                             init_noise=x)
    elif sample_method == "ddpm":
        gd = GaussianDiffusion.create(model.cfg.train.timesteps)
        mel = gd.p_sample_loop(x0_fn, x.shape, k_init, init_noise=x)
    else:
        raise ValueError(f"unknown sample_method {sample_method}")
    return mel, out_lengths
