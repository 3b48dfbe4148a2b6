"""Independent b=N step-time measurement: median blocking call minus
median RTT of a trivial op — no tracing, no slope assumption. Resolves
the slope-vs-trace discrepancy at b=8 (VERDICT r4 #9).
Usage: python check_step_time.py [batch]."""
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


def median_block(fn, n=11):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn()
        jax.block_until_ready(out)
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), ts


def main():
    b = int(sys.argv[1]) if len(sys.argv) > 1 else 8
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
    holder = {"state": state}
    _, m = compiled(holder["state"], batch)
    # the donated call above consumed state; rebuild and keep stepping via
    # holder so every blocking call is a real step
    params2 = init(jax.random.PRNGKey(1))
    holder["state"] = {"params": params2, "opt_state": tx.init(params2),
                       "step": jnp.asarray(0, jnp.int32),
                       "rng": jax.random.PRNGKey(1)}
    warm_fetch(m["loss/all"])

    triv = jax.jit(lambda x: x + 1)
    xsmall = jnp.zeros((8,), jnp.float32)
    jax.block_until_ready(triv(xsmall))
    warm_fetch(triv(xsmall))
    rtt, rtts = median_block(lambda: triv(xsmall))

    def one_step():
        holder["state"], mm = compiled(holder["state"], batch)
        return mm["loss/all"]

    blk, blks = median_block(one_step)

    def slope(n1, n2):
        def pipe(n):
            t0 = time.perf_counter()
            for _ in range(n):
                holder["state"], mm = compiled(holder["state"], batch)
            jax.block_until_ready(mm["loss/all"])
            return time.perf_counter() - t0
        t1, t2 = pipe(n1), pipe(n2)
        return (t2 - t1) / (n2 - n1)

    s1 = slope(3, 13)
    s2 = slope(5, 25)
    s3 = slope(10, 60)
    print(f"batch={b}")
    print(f"rtt median {rtt * 1e3:.1f} ms  (all: "
          f"{[round(t * 1e3, 1) for t in rtts]})")
    print(f"blocking single-step median {blk * 1e3:.1f} ms  (all: "
          f"{[round(t * 1e3, 1) for t in blks]})")
    print(f"=> blocking-minus-rtt step time: {(blk - rtt) * 1e3:.1f} ms")
    print(f"slope(3,13)={s1 * 1e3:.1f} ms  slope(5,25)={s2 * 1e3:.1f} ms  "
          f"slope(10,60)={s3 * 1e3:.1f} ms")


if __name__ == "__main__":
    main()
