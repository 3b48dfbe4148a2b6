"""Benchmark: zero-shot TTS inference RTF on one TPU chip.

Measures the full flagship inference pipeline (VITS prior + 30-step UniPC
diffusion over the 228-ch UNet1D, reference production config) and prints ONE
JSON line. ``vs_baseline`` is the ratio against BASELINE.json's target of
5x real-time per chip.
"""
from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from diff_vits_tpu.core.config import Config
    from diff_vits_tpu.models.diff_vits import DiffVits, synthesize
    from diff_vits_tpu.text.symbols import symbols

    cfg = Config()  # reference production config values
    model = DiffVits(cfg, n_vocab=len(symbols), dtype=jnp.bfloat16)

    b = 1
    t_x = 128          # ~ a sentence of phonemes (with blanks)
    t_y = 400          # generated mel frames cap (~4.27 s of audio)
    s = 240            # prompt frames (~2.6 s)
    c = cfg.data.n_mel_channels
    steps = 30

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 100, (b, t_x)), jnp.int32)
    tone = jnp.zeros((b, t_x), jnp.int32)
    lang = jnp.zeros((b, t_x), jnp.int32)
    refer = jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32)
    text_lengths = jnp.full((b,), t_x, jnp.int32)
    refer_lengths = jnp.full((b,), s, jnp.int32)

    key = jax.random.PRNGKey(0)
    # jitted init: eager init executes op-by-op, pathologically slow through
    # a remote-device tunnel
    init = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k}, text, text_lengths,
        jnp.zeros((b, t_y, c), jnp.float32), jnp.full((b,), t_y, jnp.int32),
        refer, refer_lengths, tone, lang, rng=k)["params"])
    params = init(key)

    @jax.jit
    def run(params, key):
        mel, lengths = synthesize(
            model, {"params": params}, text, text_lengths, refer,
            refer_lengths, tone, lang, key=key, sampling_steps=steps,
            sample_method="unipc", max_len=t_y)
        return mel, lengths

    # warmup / compile
    mel, lengths = run(params, key)
    jax.block_until_ready(mel)

    n_iters = 5
    t0 = time.perf_counter()
    for i in range(n_iters):
        mel, lengths = run(params, jax.random.fold_in(key, i))
        jax.block_until_ready(mel)
    dt = (time.perf_counter() - t0) / n_iters

    audio_secs = t_y * cfg.data.hop_length / cfg.data.sampling_rate
    rtf = audio_secs / dt
    print(json.dumps({
        "metric": "inference_rtf_unipc30",
        "value": round(rtf, 3),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 5.0, 3),
        "detail": {
            "sample_time_s": round(dt, 4),
            "mel_frames_per_s": round(t_y / dt, 1),
            "denoise_steps_per_s": round(steps / dt, 2),
            "audio_secs": audio_secs,
        },
    }))


if __name__ == "__main__":
    main()
