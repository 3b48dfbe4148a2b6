"""Benchmark: zero-shot TTS inference RTF on one TPU chip.

Measures the full flagship inference pipeline (VITS prior + 30-step UniPC
diffusion over the 228-ch UNet1D, reference production config) and prints ONE
JSON line. ``vs_baseline`` is the ratio against BASELINE.json's target of
5x real-time per chip.

``python bench.py train`` instead measures training throughput (jitted SPMD
train step, production config, no checkpoint/eval overhead) and reports
mel-frames/sec/chip.
"""
from __future__ import annotations

import json
import sys
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

    b = int(sys.argv[2]) if len(sys.argv) > 2 else 1
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

    def pipelined(n, tag):
        """n async dispatches, one sync at the end: total = RTT + n*t_dev."""
        t0 = time.perf_counter()
        out = None
        for i in range(n):
            out, _ = run(params, jax.random.fold_in(key, hash(tag) % 97 + i))
        jax.block_until_ready(out)
        return time.perf_counter() - t0

    # single blocking call: includes one full host<->device round trip.
    # On this box the TPU is reached through a tunnel whose RTT dwarfs the
    # on-device time, so the DEVICE time is recovered as the slope between
    # two pipelined runs of different lengths (queued executions back-to-back
    # on device; the RTT is paid once per run, not per step).
    t0 = time.perf_counter()
    out, _ = run(params, jax.random.fold_in(key, 1234))
    jax.block_until_ready(out)
    t_block = time.perf_counter() - t0
    n1, n2 = 5, 25
    t1 = pipelined(n1, "a")
    t2 = pipelined(n2, "b")
    t_dev = max((t2 - t1) / (n2 - n1), 1e-6)

    audio_secs = b * t_y * cfg.data.hop_length / cfg.data.sampling_rate
    rtf = audio_secs / t_dev
    print(json.dumps({
        "metric": "inference_rtf_unipc30",
        "value": round(rtf, 3),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 5.0, 3),
        "detail": {
            "batch": b,
            "device_time_s": round(t_dev, 5),
            "blocking_latency_s": round(t_block, 4),
            "mel_frames_per_s": round(b * t_y / t_dev, 1),
            "denoise_steps_per_s": round(steps / t_dev, 2),
            "audio_secs": audio_secs,
        },
    }))


def main_train(batch_size: int = 8):
    """Training-step throughput at production config (mel-frames/s/chip)."""
    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from diff_vits_tpu.core.config import Config
    from diff_vits_tpu.models.diff_vits import DiffVits
    from diff_vits_tpu.parallel import mesh as mesh_lib
    from diff_vits_tpu.text.symbols import symbols
    from diff_vits_tpu.train.trainer import make_optimizer, make_train_step

    cfg = Config()
    model = DiffVits(cfg, n_vocab=len(symbols), dtype=jnp.bfloat16)
    tx = make_optimizer(cfg)
    mesh = mesh_lib.make_mesh()

    b = batch_size
    t_x = cfg.data.max_text_len * 2 + 1
    t_y = cfg.data.max_mel_len
    s = t_y * 2 // 3 + 1
    c = cfg.data.n_mel_channels
    rng = np.random.default_rng(0)
    batch = {
        "text": jnp.asarray(rng.integers(1, 100, (b, t_x)), jnp.int32),
        "tone": jnp.zeros((b, t_x), jnp.int32),
        "language": jnp.zeros((b, t_x), jnp.int32),
        "spec": jnp.asarray(rng.normal(size=(b, t_y, c)), jnp.float32),
        "refer": jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32),
        "text_lengths": jnp.full(b, t_x, jnp.int32),
        "spec_lengths": jnp.full(b, t_y, jnp.int32),
        "refer_lengths": jnp.full(b, s, jnp.int32),
    }

    key = jax.random.PRNGKey(0)
    init = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k}, batch["text"], batch["text_lengths"],
        batch["spec"], batch["spec_lengths"], batch["refer"],
        batch["refer_lengths"], batch["tone"], batch["language"],
        rng=k)["params"])
    params = init(key)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32), "rng": key}
    step_fn = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))

    state, metrics = step_fn(state, batch)  # compile + 1 step
    jax.block_until_ready(metrics["loss/all"])

    def pipelined(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, metrics = step_fn(state, batch)
        jax.block_until_ready(metrics["loss/all"])
        return time.perf_counter() - t0

    # device time from the slope of two pipelined runs — the (large, this
    # box is tunneled) host<->device RTT is paid once per run, not per step
    t1, t2 = pipelined(5), pipelined(25)
    dt = max((t2 - t1) / 20, 1e-9)

    frames_per_s = b * t_y / dt
    print(json.dumps({
        "metric": "train_mel_frames_per_s_per_chip",
        "value": round(frames_per_s, 1),
        "unit": "frames/s/chip",
        "vs_baseline": None,
        "detail": {"step_time_s": round(dt, 4), "batch": b,
                   "frames_per_utt": t_y,
                   "steps_per_s": round(1 / dt, 3),
                   "loss": float(metrics["loss/all"])},
    }))


def main_scaling(per_chip_batch: int = 8):
    """Data-parallel scaling efficiency: per-chip train throughput on a
    mesh over every available device vs the single-device rate.

    On a multi-chip pod this measures real ICI scaling (BASELINE target:
    >=85% at 2 hosts); on one chip it degenerates to the train bench.
    Run under a virtual mesh (JAX_PLATFORMS=cpu +
    --xla_force_host_platform_device_count=N) to exercise the mechanics.
    """
    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from diff_vits_tpu.core.config import Config
    from diff_vits_tpu.models.diff_vits import DiffVits
    from diff_vits_tpu.parallel import mesh as mesh_lib
    from diff_vits_tpu.text.symbols import symbols
    from diff_vits_tpu.train.trainer import make_optimizer, make_train_step
    from jax.sharding import NamedSharding, PartitionSpec as P

    cfg = Config()
    model = DiffVits(cfg, n_vocab=len(symbols), dtype=jnp.bfloat16)
    tx = make_optimizer(cfg)

    def measure(n_dev):
        mesh = mesh_lib.make_mesh((n_dev,))
        b = per_chip_batch * n_dev
        t_x = cfg.data.max_text_len * 2 + 1
        t_y = cfg.data.max_mel_len
        s = t_y * 2 // 3 + 1
        c = cfg.data.n_mel_channels
        rng = np.random.default_rng(0)
        batch = {
            "text": jnp.asarray(rng.integers(1, 100, (b, t_x)), jnp.int32),
            "tone": jnp.zeros((b, t_x), jnp.int32),
            "language": jnp.zeros((b, t_x), jnp.int32),
            "spec": jnp.asarray(rng.normal(size=(b, t_y, c)), jnp.float32),
            "refer": jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32),
            "text_lengths": jnp.full(b, t_x, jnp.int32),
            "spec_lengths": jnp.full(b, t_y, jnp.int32),
            "refer_lengths": jnp.full(b, s, jnp.int32),
        }
        key = jax.random.PRNGKey(0)
        init = jax.jit(lambda k: model.init(
            {"params": k, "dropout": k}, batch["text"],
            batch["text_lengths"], batch["spec"], batch["spec_lengths"],
            batch["refer"], batch["refer_lengths"], batch["tone"],
            batch["language"], rng=k)["params"])
        params = init(key)
        state = {"params": params, "opt_state": tx.init(params),
                 "step": jnp.asarray(0, jnp.int32), "rng": key}
        state_sh = mesh_lib.state_sharding_rules(mesh, state)
        data_sh = NamedSharding(mesh, P("data"))
        step_fn = jax.jit(make_train_step(model, tx, cfg),
                          in_shardings=(state_sh,
                                        {k: data_sh for k in batch}),
                          out_shardings=(state_sh,
                                         NamedSharding(mesh, P())),
                          donate_argnums=(0,))
        state = jax.device_put(state, state_sh)
        batch = {k: jax.device_put(v, data_sh) for k, v in batch.items()}
        state, metrics = step_fn(state, batch)
        jax.block_until_ready(metrics["loss/all"])
        iters = 5
        t0 = time.perf_counter()
        for _ in range(iters):
            state, metrics = step_fn(state, batch)
        jax.block_until_ready(metrics["loss/all"])
        dt = (time.perf_counter() - t0) / iters
        return b * t_y / dt / n_dev  # frames/s/chip

    n = jax.device_count()
    one = measure(1)
    full = measure(n) if n > 1 else one
    eff = full / one
    print(json.dumps({
        "metric": "dp_scaling_efficiency",
        "value": round(eff, 4),
        "unit": f"per_chip_ratio_at_{n}_devices",
        "vs_baseline": round(eff / 0.85, 3),
        "detail": {"devices": n,
                   "frames_per_s_per_chip_1": round(one, 1),
                   "frames_per_s_per_chip_n": round(full, 1),
                   "per_chip_batch": per_chip_batch},
    }))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        main_train(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    elif len(sys.argv) > 1 and sys.argv[1] == "scaling":
        main_scaling(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    else:
        main()
