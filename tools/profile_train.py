"""Capture a jax.profiler trace of the donated b=N production train step
(VERDICT r4 #1a). Usage: python profile_train.py [batch] [logdir]."""
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


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    logdir = (sys.argv[2] if len(sys.argv) > 2
              else f"/root/repo/tmp_verify/profile_b{b}")
    cfg = Config()
    model = DiffVits(cfg, n_vocab=len(symbols), dtype=jnp.bfloat16)
    tx = make_optimizer(cfg)
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
    compiled = step_fn.lower(state, batch).compile()
    state, m = compiled(state, batch)
    warm_fetch(m["loss/all"])
    # steady-state check before tracing
    t0 = time.perf_counter()
    for _ in range(3):
        state, m = compiled(state, batch)
    jax.block_until_ready(m["loss/all"])
    print(f"pre-trace 3 steps: {(time.perf_counter() - t0) / 3:.4f}s/step",
          flush=True)

    with jax.profiler.trace(logdir):
        for _ in range(5):
            state, m = compiled(state, batch)
        jax.block_until_ready(m["loss/all"])
    print(f"trace written -> {logdir}", flush=True)


if __name__ == "__main__":
    main()
