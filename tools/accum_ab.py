"""A/B: monolithic b=32 step vs gradient accumulation (4x8, 8x4) on the
current build (re-run of docs/bench/accum_ab_r04.txt after the banded
rel-attention change). Usage: python accum_ab.py."""
import dataclasses
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from bench import warm_fetch
from diff_vits_tpu.core.cache import enable_compilation_cache

enable_compilation_cache()
from diff_vits_tpu.core.config import Config
from diff_vits_tpu.models.diff_vits import DiffVits
from diff_vits_tpu.text.symbols import symbols
from diff_vits_tpu.train.trainer import make_optimizer, make_train_step


def measure(accum: int, micro: int):
    cfg = Config()
    cfg = dataclasses.replace(cfg, train=dataclasses.replace(
        cfg.train, gradient_accumulate_every=accum))
    model = DiffVits(cfg, n_vocab=len(symbols), dtype=jnp.bfloat16)
    tx = make_optimizer(cfg)
    t_x = cfg.data.max_text_len * 2 + 1
    t_y = cfg.data.max_mel_len
    s = t_y * 2 // 3 + 1
    c = cfg.data.n_mel_channels
    rng = np.random.default_rng(0)

    def mk(b):
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

    flat = mk(micro)
    batch = flat if accum == 1 else {
        k: jnp.stack([v] * accum) for k, v in flat.items()}
    key = jax.random.PRNGKey(0)
    init = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k}, flat["text"], flat["text_lengths"],
        flat["spec"], flat["spec_lengths"], flat["refer"],
        flat["refer_lengths"], flat["tone"], flat["language"],
        rng=k)["params"])
    params = init(key)
    state = {"params": params, "opt_state": tx.init(params),
             "step": jnp.asarray(0, jnp.int32), "rng": key}
    step_fn = jax.jit(make_train_step(model, tx, cfg), donate_argnums=(0,))
    compiled = step_fn.lower(state, batch).compile()
    state, m = compiled(state, batch)
    warm_fetch(m["loss/all"])

    def pipe(n):
        nonlocal state
        t0 = time.perf_counter()
        for _ in range(n):
            state, mm = compiled(state, batch)
        jax.block_until_ready(mm["loss/all"])
        return time.perf_counter() - t0

    t1, t2 = pipe(3), pipe(13)
    dt = (t2 - t1) / 10
    gframes = accum * micro * t_y
    print(f"accum={accum} micro={micro}: {dt * 1e3:.1f} ms/opt-step  "
          f"{gframes / dt:.0f} mel-frames/s (global batch {accum * micro})",
          flush=True)
    return dt


if __name__ == "__main__":
    mono = measure(1, 32)
    a48 = measure(4, 8)
    a84 = measure(8, 4)
    print(f"4x8 vs monolithic: {mono / a48:.3f}x   "
          f"8x4 vs monolithic: {mono / a84:.3f}x")
