"""TTS inference CLI: text -> frontend -> prior -> diffusion -> mel (-> wav).

Parity: tts_infer.py:22-169. The Vocos vocoder is external; when the
``vocos`` package (torch) is importable we decode to waveform, otherwise we
save the mel as .npy (mel is the scored artifact per BASELINE.json).

Usage:
  python -m diff_vits_tpu.infer.tts_infer --text "你好，再见。" \
      --refer raw/138.wav -c config.json -m logs/tts/.../model-1000.ckpt
"""
from __future__ import annotations

import argparse
import functools
import os

import jax
import jax.numpy as jnp
import numpy as np

from diff_vits_tpu.core.config import load_config, Config
from diff_vits_tpu.core.masking import intersperse
from diff_vits_tpu.data import audio as audio_lib
from diff_vits_tpu.models.diff_vits import DiffVits, synthesize
from diff_vits_tpu.text.frontend import clean_text, cleaned_text_to_sequence
from diff_vits_tpu.text.symbols import symbols
from diff_vits_tpu.train import checkpoint as ckpt_lib


def preprocess_text(text: str, language: str = "ZH", add_blank: bool = True):
    """text -> (phone, tone, language) int arrays. Parity: tts_infer.py:22."""
    norm_text, phones, tones, word2ph = clean_text(text, language)
    phone, tone, lang = cleaned_text_to_sequence(phones, tones, language)
    if add_blank:
        phone = intersperse(phone, 0)
        tone = intersperse(tone, 0)
        lang = intersperse(lang, 0)
    return (np.asarray(phone, np.int32)[None],
            np.asarray(tone, np.int32)[None],
            np.asarray(lang, np.int32)[None])


def load_refer_mel(path: str, cfg: Config):
    wav, sr = audio_lib.read_wav(path)
    wav = audio_lib.resample(wav, sr, cfg.data.sampling_rate)
    mel = audio_lib.log_mel(wav, sr=cfg.data.sampling_rate,
                            hop_length=cfg.data.hop_length,
                            n_mels=cfg.data.n_mel_channels)
    return mel[None]  # [1, S, C]


def main():
    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser()
    parser.add_argument("--text", type=str, default="你好，再见。")
    parser.add_argument("--lang", type=str, default="ZH",
                        choices=["ZH", "EN", "JA"])
    parser.add_argument("--refer", type=str, required=True)
    parser.add_argument("-c", "--config_path", type=str, default="config.json")
    parser.add_argument("-m", "--model_path", type=str, required=True)
    parser.add_argument("--steps", type=int, default=30)
    parser.add_argument("--sample_method", type=str, default="unipc",
                        choices=["unipc", "dpmsolver", "ddim", "ddpm"])
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--noise_scale", type=float, default=0.667,
                        help="prior sampling temperature (model3.py:817)")
    parser.add_argument("--length_scale", type=float, default=1.0,
                        help="duration multiplier (>1 = slower speech). "
                             "The reference CLI parses speed controls but "
                             "ignores them (tts_infer.py:112-129,161); "
                             "this one works")
    parser.add_argument("--dtype", type=str, default="bfloat16",
                        choices=["bfloat16", "float32"],
                        help="serving precision: bfloat16 computes on the "
                             "MXU's native type and holds the checkpoint "
                             "in bf16 HBM residency (~13%% faster at "
                             "batch 1, see core/params.py); float32 for "
                             "exact reference-parity runs")
    parser.add_argument("--out_dir", type=str, default="output")
    parser.add_argument("--vocoder", type=str, default="auto",
                        choices=["auto", "jax", "torch", "none"],
                        help="waveform decoder: 'jax' = our Vocos port "
                             "(needs --vocoder_ckpt), 'torch' = external "
                             "vocos package, 'none' = mel only")
    parser.add_argument("--vocoder_ckpt", type=str, default=None,
                        help="Vocos weights: torch state_dict (.bin/.pt) "
                             "converted on the fly, or our .ckpt")
    args = parser.parse_args()

    cfg = load_config(args.config_path) if os.path.exists(args.config_path) \
        else Config()
    dtype = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = DiffVits(cfg, n_vocab=len(symbols), dtype=dtype)

    _, saved = ckpt_lib.load_checkpoint(args.model_path)
    params = {"params": saved["params"]}
    if dtype == jnp.bfloat16:
        from diff_vits_tpu.core.params import cast_float_params
        params = cast_float_params(params, dtype)

    phone, tone, lang = preprocess_text(args.text, args.lang,
                                        cfg.data.add_blank)
    refer = load_refer_mel(args.refer, cfg)
    text_lengths = np.array([phone.shape[1]], np.int32)
    refer_lengths = np.array([refer.shape[1]], np.int32)

    run = jax.jit(functools.partial(
        synthesize, model, sampling_steps=args.steps,
        sample_method=args.sample_method, noise_scale=args.noise_scale,
        length_scale=args.length_scale))
    mel, out_lengths = run(
        params, jnp.asarray(phone), jnp.asarray(text_lengths),
        jnp.asarray(refer, jnp.float32), jnp.asarray(refer_lengths),
        jnp.asarray(tone), jnp.asarray(lang),
        key=jax.random.PRNGKey(args.seed))
    mel = np.asarray(mel[0, :int(out_lengths[0])], np.float32)

    os.makedirs(args.out_dir, exist_ok=True)
    base = os.path.join(
        args.out_dir, f"tts_{os.path.basename(args.refer)}")
    np.save(base + ".mel.npy", mel)
    print(f"mel saved: {base}.mel.npy shape={mel.shape}")

    if args.vocoder == "none":
        return
    if args.vocoder in ("auto", "jax") and (args.vocoder_ckpt
                                            or args.vocoder == "jax"):
        from diff_vits_tpu.models.vocoder import load_vocoder
        if not args.vocoder_ckpt:
            print("warning: no --vocoder_ckpt; using random-init vocoder "
                  "(audio will be noise)")
        voc, vparams = load_vocoder(cfg, args.vocoder_ckpt)
        audio = jax.jit(lambda m: voc.apply({"params": vparams}, m))(
            jnp.asarray(mel[None]))
        audio_lib.write_wav(base + ".wav", np.asarray(audio[0], np.float32),
                            cfg.data.sampling_rate)
        print(f"wav saved: {base}.wav")
        return
    try:
        import torch
        from vocos import Vocos as TorchVocos
        vocos = TorchVocos.from_pretrained("charactr/vocos-mel-24khz")
        audio = vocos.decode(torch.tensor(mel.T[None]))
        audio_lib.write_wav(base + ".wav", audio[0].numpy(), 24000)
        print(f"wav saved: {base}.wav")
    except Exception as e:  # vocoder optional
        print(f"vocos unavailable ({e}); mel only")


if __name__ == "__main__":
    main()
