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


def warm_fetch(out):
    """Force real execution of a dispatched computation before timing.

    On this box the TPU sits behind a tunnel ("axon") that defers the
    server-side executable build until a result is first *materialized*:
    ``block_until_ready`` on a freshly compiled program can return before
    anything ran, and subsequent timings then measure dispatch only
    (measured: a chained 8192^3 matmul "ran" at 289x chip peak until the
    first fetch; afterwards the same slope method reports 97.7% of peak).
    Fetching one element of every output leaf makes all later
    ``block_until_ready`` calls honest.
    """
    for leaf in jax.tree_util.tree_leaves(out):
        if isinstance(leaf, jax.Array):
            np.asarray(jax.device_get(leaf.ravel()[:1]))


def main(b: int = 1, param_dtype="bfloat16", with_train: bool = True):
    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from diff_vits_tpu.core.config import Config
    from diff_vits_tpu.models.diff_vits import DiffVits, synthesize
    from diff_vits_tpu.text.symbols import symbols

    cfg = Config()  # reference production config values
    model = DiffVits(cfg, n_vocab=len(symbols), dtype=jnp.bfloat16)
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
    if param_dtype == "bfloat16":
        # bf16 weight residency (serving default, core/params.py): the
        # batch-1 sampler is HBM-bound on re-reading the UNet weights each
        # denoise step; halving weight bytes cuts device time ~13% at b=1.
        # Pass "fp32"/"float32" on the CLI for the fp32-resident baseline.
        from diff_vits_tpu.core.params import cast_float_params
        params = cast_float_params(params, jnp.bfloat16)

    @jax.jit
    def run(params, key):
        mel, lengths = synthesize(
            model, {"params": params}, text, text_lengths, refer,
            refer_lengths, tone, lang, key=key, sampling_steps=steps,
            sample_method="unipc", max_len=t_y)
        return mel, lengths

    # warmup / compile (fetch forces the deferred server-side build+run)
    mel, lengths = run(params, key)
    warm_fetch((mel, lengths))

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
    detail = {
        "batch": b,
        "param_dtype": param_dtype,
        "device_time_s": round(t_dev, 5),
        "blocking_latency_s": round(t_block, 4),
        "mel_frames_per_s": round(b * t_y / t_dev, 1),
        "denoise_steps_per_s": round(steps / t_dev, 2),
        "audio_secs": audio_secs,
    }
    if with_train:
        # VERDICT r3 #2: the driver artifact must carry the training numbers
        # too, not just inference RTF — measure the b=32 production train
        # step (time, MFU, achieved HBM bandwidth) and the end-to-end
        # Trainer loop rate in the same run.
        try:
            detail.update(_train_probe(model, cfg, batch_size=32))
        except Exception as e:  # never lose the headline metric
            detail["train_probe_error"] = str(e)[:160]
        try:
            r = _trainloop_probe(batch_size=32, steps=15)
            detail["trainloop_steps_per_s"] = r["steps_per_s"]
            detail["trainloop_loader"] = r["loader"]
        except Exception as e:
            detail["trainloop_probe_error"] = str(e)[:160]
    print(json.dumps({
        "metric": "inference_rtf_unipc30",
        "value": round(rtf, 3),
        "unit": "x_realtime_per_chip",
        "vs_baseline": round(rtf / 5.0, 3),
        "detail": detail,
    }))


def _train_probe(model, cfg, batch_size: int = 32) -> dict:
    """Compile + time the production train step; return driver-artifact
    fields {train_step_time_b32, train_mfu, train_achieved_hbm_gbps,
    train_hbm_frac_of_peak} (VERDICT r3 next-round #1/#2)."""
    from diff_vits_tpu.train.trainer import make_optimizer, make_train_step

    tx = make_optimizer(cfg)
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
    lower_bytes = _analytic_lower_bytes(state, batch)
    # donate the state like the production Trainer step (in-place buffer
    # reuse; without it XLA must double-buffer params + optimizer state)
    step_fn = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    compiled = step_fn.lower(state, batch).compile()
    flops, nbytes = _flops_of(compiled), _bytes_of(compiled)
    temp_bytes = _temp_bytes_of(compiled)
    if temp_bytes:
        # the peak temp allocation is the materialized activation set the
        # remat A/B proves cannot be traded away: every resident byte was
        # written by the forward pass and (almost all) read back by the
        # backward — count one write + one read on top of the param floor
        lower_bytes += 2.0 * temp_bytes
    state, metrics = compiled(state, batch)
    warm_fetch(metrics["loss/all"])

    def pipelined(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, m = compiled(state, batch)
        jax.block_until_ready(m["loss/all"])
        return time.perf_counter() - t0

    t1, t2 = pipelined(3), pipelined(13)
    dt = max((t2 - t1) / 10, 1e-9)
    peak_fl, peak_bw = _peak_flops_per_s(), _peak_hbm_bytes_per_s()
    return {
        f"train_step_time_b{b}": round(dt, 4),
        "train_steps_per_s": round(1 / dt, 3),
        "train_mel_frames_per_s": round(b * t_y / dt, 1),
        "train_mfu": round(flops / dt / peak_fl, 4),
        # bandwidth BRACKET, not a measurement (VERDICT r4 #1/#6): XLA's
        # cost-model bytes over-count under donation/aliasing (an UPPER
        # bound — r4 published them as "achieved" and they exceeded the
        # physical peak), while the analytic floor counts only traffic any
        # correct step must move (a LOWER bound, excludes activations).
        # True achieved bandwidth lies between the two.
        "train_bytes_source": "bracket[analytic_lower, xla_costmodel_upper]",
        "train_costmodel_hbm_gbps_upper": round(nbytes / dt / 1e9, 1),
        "train_costmodel_hbm_frac_upper": round(nbytes / dt / peak_bw, 4),
        "train_lowerbound_hbm_gbps": round(lower_bytes / dt / 1e9, 1),
        "train_lowerbound_hbm_frac": round(lower_bytes / dt / peak_bw, 4),
        "train_peak_temp_gb": round(temp_bytes / 1e9, 3),
    }


def _temp_bytes_of(compiled) -> float:
    """Peak temp-buffer allocation of the executable (activations live
    across the forward->backward boundary) from XLA's memory analysis;
    0.0 where the backend doesn't report it."""
    try:
        ma = compiled.memory_analysis()
        if isinstance(ma, (list, tuple)):
            ma = ma[0]
        return float(getattr(ma, "temp_size_in_bytes", 0.0))
    except Exception:
        return 0.0


def _analytic_lower_bytes(state, batch) -> float:
    """Analytic LOWER bound on HBM bytes per train step (VERDICT r4 #1b):
    only traffic that any correct implementation of the step must move,
    however aggressively XLA fuses:

      * AdamW update: read {param, grad, m, v}, write {param, m, v} —
        all fp32 -> 28 B/param;
      * the backward pass materializes every gradient once (write,
        4 B/param; its read is counted in the update);
      * forward and backward must each read every weight at least once at
        compute precision (bf16 -> 2 x 2 B/param);
      * the input batch is read from HBM once.

    Every intermediate activation is excluded, so the real traffic is
    strictly above this floor; XLA's cost-model "bytes accessed" is the
    matching upper bound."""
    p_elems = sum(int(np.prod(l.shape)) for l in
                  jax.tree_util.tree_leaves(state["params"]))
    batch_bytes = sum(l.size * l.dtype.itemsize for l in
                      jax.tree_util.tree_leaves(batch))
    return 36.0 * p_elems + batch_bytes


def main_serving(batch_size: int = 8, buckets=(400, 800, 1600),
                 steps: int = 30):
    """End-to-end audio serving bench (VERDICT r4 #5): per mel bucket,
    device time and RTF for mel-only synthesis AND mel+Vocos decode
    on-chip — the number a deployer needs. Buckets are the serve.py
    defaults (max_mel_len x {1,2,4}); the vocoder is the production-shape
    Vocos port (random weights — cost is weight-independent)."""
    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from diff_vits_tpu.core.config import Config
    from diff_vits_tpu.core.params import cast_float_params
    from diff_vits_tpu.models.diff_vits import DiffVits, synthesize
    from diff_vits_tpu.models.vocoder import load_vocoder
    from diff_vits_tpu.text.symbols import symbols

    cfg = Config()
    model = DiffVits(cfg, n_vocab=len(symbols), dtype=jnp.bfloat16)
    voc, vparams = load_vocoder(cfg)
    b = batch_size
    t_x, s, c = 128, 240, cfg.data.n_mel_channels
    hop, sr = cfg.data.hop_length, cfg.data.sampling_rate

    rng = np.random.default_rng(0)
    text = jnp.asarray(rng.integers(1, 100, (b, t_x)), jnp.int32)
    tone = jnp.zeros((b, t_x), jnp.int32)
    lang = jnp.zeros((b, t_x), jnp.int32)
    refer = jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32)
    text_lengths = jnp.full((b,), t_x, jnp.int32)
    refer_lengths = jnp.full((b,), s, jnp.int32)

    key = jax.random.PRNGKey(0)
    init = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k}, text, text_lengths,
        jnp.zeros((b, buckets[0], c), jnp.float32),
        jnp.full((b,), buckets[0], jnp.int32),
        refer, refer_lengths, tone, lang, rng=k)["params"])
    params = cast_float_params(init(key), jnp.bfloat16)

    rows = []
    for t_y in buckets:
        @jax.jit
        def mel_only(params, key, t_y=t_y):
            return synthesize(model, {"params": params}, text, text_lengths,
                              refer, refer_lengths, tone, lang, key=key,
                              sampling_steps=steps, sample_method="unipc",
                              max_len=t_y)

        @jax.jit
        def mel_and_wav(params, vparams, key, t_y=t_y):
            mel, lengths = synthesize(
                model, {"params": params}, text, text_lengths, refer,
                refer_lengths, tone, lang, key=key, sampling_steps=steps,
                sample_method="unipc", max_len=t_y)
            return voc.apply({"params": vparams}, mel), lengths

        def timed(fn, *args):
            out = fn(*args, key)
            warm_fetch(out)
            keys = [jax.random.fold_in(key, i) for i in range(16)]
            jax.block_until_ready(keys)

            def pipe(n):
                t0 = time.perf_counter()
                o = None
                for i in range(n):
                    o = fn(*args, keys[i])
                jax.block_until_ready(o)
                return time.perf_counter() - t0

            t1, t2 = pipe(3), pipe(13)
            return max((t2 - t1) / 10, 1e-9)

        dt_mel = timed(mel_only, params)
        dt_wav = timed(mel_and_wav, params, vparams)
        audio_secs = b * t_y * hop / sr
        rows.append({
            "batch": b, "mel_bucket": t_y,
            "audio_secs": round(audio_secs, 2),
            "mel_device_time_s": round(dt_mel, 5),
            "mel_rtf": round(audio_secs / dt_mel, 1),
            "e2e_device_time_s": round(dt_wav, 5),
            "e2e_rtf": round(audio_secs / dt_wav, 1),
            "vocoder_overhead_s": round(dt_wav - dt_mel, 5),
        })
        print(f"# serving {rows[-1]}", file=sys.stderr, flush=True)

    head = rows[0]
    print(json.dumps({
        "metric": "serving_e2e_audio_rtf",
        "value": head["e2e_rtf"],
        "unit": f"x_realtime_per_chip_b{b}_incl_vocoder",
        "vs_baseline": round(head["e2e_rtf"] / 5.0, 3),
        "detail": {"rows": rows, "unipc_steps": steps,
                   "param_dtype": "bfloat16",
                   "device_kind": jax.devices()[0].device_kind},
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
    warm_fetch(metrics["loss/all"])

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
        # explicit submesh: make_mesh() always spans every device, but the
        # baseline leg needs a genuine 1-device mesh
        from jax.sharding import Mesh
        mesh = Mesh(np.array(jax.devices()[:n_dev]), ("data",))
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
        warm_fetch(metrics["loss/all"])
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


def _trainloop_probe(batch_size: int = 32, steps: int = 30) -> dict:
    """End-to-end training-loop throughput at production batch: loader +
    H2D + jitted step + metrics, through the real Trainer. Builds a
    synthetic preprocessed dataset on the fly."""
    import os
    import shutil
    import tempfile

    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    import dataclasses

    from diff_vits_tpu.core.config import Config
    from diff_vits_tpu.text.symbols import symbols
    from diff_vits_tpu.train.trainer import Trainer

    cfg = Config()
    cfg = dataclasses.replace(
        cfg, train=dataclasses.replace(
            cfg.train, train_batch_size=batch_size, num_workers=0))

    tmp = tempfile.mkdtemp(prefix="dvt_bench_")
    try:
        rng = np.random.default_rng(0)
        n_utts = max(2 * batch_size, 64)
        c = cfg.data.n_mel_channels
        for i in range(n_utts):
            t = int(rng.integers(cfg.data.max_mel_len,
                                 cfg.data.max_mel_len * 2))
            np.save(os.path.join(tmp, f"u{i}.mel.npy"),
                    rng.normal(size=(t, c)).astype(np.float32))
            n_ph = int(rng.integers(24, 48))
            phones = " ".join(
                symbols[int(j)] for j in rng.integers(1, 40, n_ph))
            tones = " ".join("0" for _ in range(n_ph))
            w2ph = " ".join("1" for _ in range(n_ph))
            with open(os.path.join(tmp, f"u{i}.txt"), "w") as f:
                f.write(f"EN|x|{phones}|{tones}|{w2ph}\n")
            with open(os.path.join(tmp, f"u{i}.wav"), "wb") as f:
                f.write(b"RIFF\x24\x00\x00\x00WAVEfmt ")  # stub; mel.npy wins
        cfg = dataclasses.replace(
            cfg, data=dataclasses.replace(cfg.data, training_files=tmp,
                                          val_files=tmp))

        trainer = Trainer(cfg, workdir=os.path.join(tmp, "logs"))
        batches = trainer._prefetch(iter(trainer.loader))
        # warmup: compile + pipeline fill
        for _ in range(3):
            trainer.state, metrics = trainer.train_step(
                trainer.state, next(batches))
        warm_fetch(metrics["loss/all"])

        t0 = time.perf_counter()
        for _ in range(steps):
            trainer.state, metrics = trainer.train_step(
                trainer.state, next(batches))
        jax.block_until_ready(metrics["loss/all"])
        dt = (time.perf_counter() - t0) / steps

        t_y = cfg.data.max_mel_len
        return {"loader": trainer.loader_kind,
                "step_time_s": round(dt, 4),
                "steps_per_s": round(1 / dt, 3),
                "mel_frames_per_s": round(batch_size * t_y / dt, 1),
                "batch": batch_size,
                "loss": float(metrics["loss/all"])}
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def main_trainloop(batch_size: int = 32, steps: int = 30):
    """CLI wrapper for the Trainer-loop probe (VERDICT r3 #6)."""
    r = _trainloop_probe(batch_size, steps)
    print(json.dumps({
        "metric": "trainloop_steps_per_s",
        "value": r["steps_per_s"],
        "unit": f"steps/s_e2e_batch{batch_size}",
        "vs_baseline": None,
        "detail": r,
    }))


def main_ab_remat(batch_size: int = 32):
    """A/B the b=32 production train step across remat policies
    (VERDICT r3 next-round #1: one honest optimization attempt at the
    measured HBM bottleneck). Reports time, FLOPs, bytes, achieved GB/s
    per policy."""
    import dataclasses

    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from diff_vits_tpu.core.config import Config
    from diff_vits_tpu.models.diff_vits import DiffVits
    from diff_vits_tpu.text.symbols import symbols

    peak_fl, peak_bw = _peak_flops_per_s(), _peak_hbm_bytes_per_s()
    rows = {}
    for policy in ("none", "dots", "full"):
        cfg = Config()
        cfg = dataclasses.replace(
            cfg, train=dataclasses.replace(cfg.train, remat_policy=policy))
        model = DiffVits(cfg, n_vocab=len(symbols), dtype=jnp.bfloat16)
        try:
            r = _train_probe(model, cfg, batch_size=batch_size)
        except Exception as e:
            rows[policy] = {"error": str(e)[:160]}
            continue
        rows[policy] = r
        print(f"# remat={policy}: {r}", file=sys.stderr, flush=True)
    base = rows.get("none", {}).get(f"train_step_time_b{batch_size}")
    best_p = min((p for p in rows if "error" not in rows[p]),
                 key=lambda p: rows[p][f"train_step_time_b{batch_size}"],
                 default=None)
    speedup = (base / rows[best_p][f"train_step_time_b{batch_size}"]
               if base and best_p else None)
    print(json.dumps({
        "metric": "remat_ab_best_speedup",
        # null (not 0.0) when the no-remat baseline row errored: 0.0 reads
        # as "no speedup" when the truth is "baseline missing" (ADVICE r4)
        "value": round(speedup, 4) if speedup else None,
        "unit": f"x_vs_no_remat_b{batch_size}",
        "vs_baseline": None,
        "detail": {"rows": rows, "best_policy": best_p,
                   "peak_tflops": round(peak_fl / 1e12, 1),
                   "peak_hbm_gbps": round(peak_bw / 1e9, 1)},
    }))


_PEAK_BF16_TFLOPS = {
    # per-chip dense bf16 peak (public TPU specs)
    "v3": 123.0, "v4": 275.0, "v5 lite": 197.0, "v5e": 197.0,
    "v5litepod": 197.0, "v5p": 459.0, "v6e": 918.0, "v6 lite": 918.0,
}

_PEAK_HBM_GBPS = {
    # per-chip HBM bandwidth (public TPU specs, GB/s)
    "v3": 900.0, "v4": 1228.0, "v5 lite": 819.0, "v5e": 819.0,
    "v5litepod": 819.0, "v5p": 2765.0, "v6e": 1640.0, "v6 lite": 1640.0,
}


def _lookup_peak(table, env_var, default):
    import os
    env = os.environ.get(env_var)
    if env:
        return float(env)
    kind = jax.devices()[0].device_kind.lower()
    for k, v in table.items():
        if k in kind:
            return v
    return default


def _peak_flops_per_s() -> float:
    # BASELINE.md target hardware default: v5e
    return _lookup_peak(_PEAK_BF16_TFLOPS, "DIFF_VITS_PEAK_TFLOPS",
                        197.0) * 1e12


def _peak_hbm_bytes_per_s() -> float:
    return _lookup_peak(_PEAK_HBM_GBPS, "DIFF_VITS_PEAK_HBM_GBPS",
                        819.0) * 1e9


def _flops_of(compiled) -> float:
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("flops", 0.0))


def _bytes_of(compiled) -> float:
    """Total HBM bytes accessed per execution from XLA's cost model
    (post-fusion operand+output traffic) — the roofline denominator."""
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    return float(ca.get("bytes accessed", 0.0))


def main_mfu(batches=(8, 32, 64, 128)):
    """Roofline of the jitted train step across a batch (and optionally
    mel-length: ``64x800``) sweep: FLOPs and bytes-accessed from XLA's cost
    model on the compiled executable, MFU = FLOPs/step_time / chip FLOP
    peak, achieved HBM GB/s vs chip bandwidth peak, and arithmetic
    intensity vs the machine balance point. Answers *which* roof each
    config is under (VERDICT r3 weak #1)."""
    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    from diff_vits_tpu.core.config import Config
    from diff_vits_tpu.models.diff_vits import DiffVits, synthesize
    from diff_vits_tpu.text.symbols import symbols
    from diff_vits_tpu.train.trainer import make_optimizer, make_train_step

    cfg = Config()
    model = DiffVits(cfg, n_vocab=len(symbols), dtype=jnp.bfloat16)
    tx = make_optimizer(cfg)
    peak = _peak_flops_per_s()
    peak_bw = _peak_hbm_bytes_per_s()
    balance = peak / peak_bw  # flops/byte where the two roofs cross

    t_x = cfg.data.max_text_len * 2 + 1
    t_y0 = cfg.data.max_mel_len
    c = cfg.data.n_mel_channels

    def make_batch(b, t_y):
        s = t_y * 2 // 3 + 1
        rng = np.random.default_rng(0)
        return {
            "text": jnp.asarray(rng.integers(1, 100, (b, t_x)), jnp.int32),
            "tone": jnp.zeros((b, t_x), jnp.int32),
            "language": jnp.zeros((b, t_x), jnp.int32),
            "spec": jnp.asarray(rng.normal(size=(b, t_y, c)), jnp.float32),
            "refer": jnp.asarray(rng.normal(size=(b, s, c)), jnp.float32),
            "text_lengths": jnp.full(b, t_x, jnp.int32),
            "spec_lengths": jnp.full(b, t_y, jnp.int32),
            "refer_lengths": jnp.full(b, s, jnp.int32),
        }

    batch0 = make_batch(2, t_y0)
    key = jax.random.PRNGKey(0)
    init = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k}, batch0["text"], batch0["text_lengths"],
        batch0["spec"], batch0["spec_lengths"], batch0["refer"],
        batch0["refer_lengths"], batch0["tone"], batch0["language"],
        rng=k)["params"])
    params = init(key)

    rows = []
    best = None
    for spec in batches:
        b, _, ty = str(spec).partition("x")
        b, t_y = int(b), int(ty) if ty else t_y0
        batch = make_batch(b, t_y)
        # fresh param/key copies per config: the donated step consumes its
        # input buffers, and `params`/`key` must survive for the next sweep
        # entry (a shared `key` donated by the previous row leaves a
        # deleted buffer -> INVALID_ARGUMENT on the next one)
        p = jax.tree_util.tree_map(jnp.copy, params)
        state = {"params": p, "opt_state": tx.init(p),
                 "step": jnp.asarray(0, jnp.int32), "rng": jnp.copy(key)}
        lower_bytes = _analytic_lower_bytes(state, batch)
        # donated, matching the production Trainer step
        step_fn = jax.jit(make_train_step(model, tx, cfg),
                          donate_argnums=(0,))
        try:
            compiled = step_fn.lower(state, batch).compile()
            flops, nbytes = _flops_of(compiled), _bytes_of(compiled)
            lower_bytes += 2.0 * _temp_bytes_of(compiled)
            state, metrics = compiled(state, batch)  # warmup
            warm_fetch(metrics["loss/all"])

            def pipelined(n):
                nonlocal state
                t0 = time.perf_counter()
                for _ in range(n):
                    state, m = compiled(state, batch)
                jax.block_until_ready(m["loss/all"])
                return time.perf_counter() - t0

            t1, t2 = pipelined(3), pipelined(13)
            dt = max((t2 - t1) / 10, 1e-9)
        except Exception as e:  # OOM at large batch: record and stop
            rows.append({"batch": b, "mel_len": t_y, "error": str(e)[:120]})
            # free the failed config's buffers so the infer probe below
            # doesn't inherit an exhausted backend (r4: b=128 OOM poisoned
            # the b=1 infer row)
            del state, batch
            break
        mfu = flops / dt / peak
        ai = flops / max(nbytes, 1.0)
        # cost-model bytes are an UPPER bound (donation/aliasing
        # over-count); the analytic floor is the matching LOWER bound —
        # achieved bandwidth lies in the bracket (VERDICT r4 #1/#6)
        rows.append({"batch": b, "mel_len": t_y, "step_time_s": round(dt, 4),
                     "tflops_per_step": round(flops / 1e12, 3),
                     "costmodel_gbytes_upper": round(nbytes / 1e9, 3),
                     "lowerbound_gbytes": round(lower_bytes / 1e9, 3),
                     "frames_per_s": round(b * t_y / dt, 1),
                     "mfu": round(mfu, 4),
                     "costmodel_hbm_gbps_upper": round(nbytes / dt / 1e9, 1),
                     "costmodel_hbm_frac_upper":
                         round(nbytes / dt / peak_bw, 4),
                     "lowerbound_hbm_gbps": round(lower_bytes / dt / 1e9, 1),
                     "lowerbound_hbm_frac":
                         round(lower_bytes / dt / peak_bw, 4),
                     "arith_intensity": round(ai, 1),
                     "bound": "memory" if ai < balance else "compute"})
        print(f"# mfu b={b} ty={t_y}: {rows[-1]}", file=sys.stderr, flush=True)
        if best is None or mfu > best["mfu"]:
            best = rows[-1]
        del state, batch, compiled

    # one denoise step of the inference UNet at b=1 (the RTF workload)
    infer_row = None
    try:
        rngk = np.random.default_rng(0)
        text = jnp.asarray(rngk.integers(1, 100, (1, 128)), jnp.int32)
        refer = jnp.asarray(rngk.normal(size=(1, 240, c)), jnp.float32)
        syn = jax.jit(lambda p, k: synthesize(
            model, {"params": p}, text, jnp.full((1,), 128, jnp.int32),
            refer, jnp.full((1,), 240, jnp.int32),
            jnp.zeros((1, 128), jnp.int32), jnp.zeros((1, 128), jnp.int32),
            key=k, sampling_steps=30, sample_method="unipc", max_len=t_y0))
        compiled = syn.lower(params, key).compile()
        fl, nb = _flops_of(compiled), _bytes_of(compiled)
        out = compiled(params, key)
        warm_fetch(out)
        # precompute + materialize the keys: a fold_in dispatched inside the
        # timing loop serializes each call on this box's tunnel
        keys = [jax.random.fold_in(key, i) for i in range(26)]
        jax.block_until_ready(keys)

        def pipe(n):
            t0 = time.perf_counter()
            o = None
            for i in range(n):
                o = compiled(params, keys[i])
            jax.block_until_ready(o)
            return time.perf_counter() - t0

        t1, t2 = pipe(5), pipe(25)
        dt_i = max((t2 - t1) / 20, 1e-9)
        ai_i = fl / max(nb, 1.0)
        infer_row = {"tflops_per_call": round(fl / 1e12, 3),
                     "costmodel_gbytes_upper": round(nb / 1e9, 3),
                     "call_time_s": round(dt_i, 4),
                     "mfu": round(fl / dt_i / peak, 4),
                     "costmodel_hbm_gbps_upper": round(nb / dt_i / 1e9, 1),
                     "costmodel_hbm_frac_upper":
                         round(nb / dt_i / peak_bw, 4),
                     "arith_intensity": round(ai_i, 1),
                     "bound": "memory" if ai_i < balance else "compute"}
    except Exception as e:
        infer_row = {"error": str(e)[:120]}

    print(json.dumps({
        "metric": "train_step_mfu",
        "value": best["mfu"] if best else 0.0,
        "unit": f"fraction_of_{peak/1e12:.0f}_tflops_peak",
        "vs_baseline": None,  # the reference publishes no MFU (BASELINE.md)
        "detail": {"sweep": rows, "best": best,
                   "infer_unipc30_b1": infer_row,
                   "peak_tflops": round(peak / 1e12, 1),
                   "peak_hbm_gbps": round(peak_bw / 1e9, 1),
                   "machine_balance_flops_per_byte": round(balance, 1),
                   "device_kind": jax.devices()[0].device_kind},
    }))


if __name__ == "__main__":
    import os
    if os.environ.get("JAX_PLATFORMS"):
        # the box's sitecustomize freezes the axon TPU platform into
        # jax.config at interpreter startup; honor an explicit env override
        # (e.g. JAX_PLATFORMS=cpu for the virtual-mesh scaling run)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    if len(sys.argv) > 1 and sys.argv[1] == "train":
        main_train(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    elif len(sys.argv) > 1 and sys.argv[1] == "scaling":
        main_scaling(int(sys.argv[2]) if len(sys.argv) > 2 else 8)
    elif len(sys.argv) > 1 and sys.argv[1] == "mfu":
        bs = tuple(sys.argv[2:]) or (8, 32, 64, 128)
        main_mfu(bs)
    elif len(sys.argv) > 1 and sys.argv[1] == "trainloop":
        main_trainloop(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
    elif len(sys.argv) > 1 and sys.argv[1] == "ab_remat":
        main_ab_remat(int(sys.argv[2]) if len(sys.argv) > 2 else 32)
    elif len(sys.argv) > 1 and sys.argv[1] == "serving":
        b = int(sys.argv[2]) if len(sys.argv) > 2 else 8
        buckets = tuple(int(x) for x in sys.argv[3].split(",")) \
            if len(sys.argv) > 3 else (400, 800, 1600)
        main_serving(b, buckets)
    else:
        # default / `infer` mode: [infer] [batch] [fp32|bf16] [notrain]
        # e.g. `bench.py infer 8 fp32 notrain` times the fp32-resident
        # batch-8 serving path without the train-step probe.
        toks = sys.argv[1:]
        if toks and toks[0] == "infer":
            toks = toks[1:]
        batch, dtype, with_train = 1, "bfloat16", True
        for t in toks:
            if t.isdigit():
                batch = int(t)
            elif t in ("fp32", "float32"):
                dtype = "float32"
            elif t in ("bf16", "bfloat16"):
                dtype = "bfloat16"
            elif t == "notrain":
                with_train = False
        main(batch, dtype, with_train)
