"""Training loop: donated-buffer jitted step, SPMD data parallelism.

Parity: ``Trainer`` (model3.py:1278-1454) redesigned TPU-first:

* one jitted ``train_step`` (loss + grad + global-norm clip + AdamW) with
  donated state buffers; gradient AllReduce is inserted by pjit from the
  batch sharding — no explicit communication;
* grad-clip schedule 10.0 -> 1.0 at 100k steps (model3.py:1376-1379) inside
  the compiled step (branch on a traced step counter, no recompile);
* MAS-noise annealing by step (model3.py:1214-1220) computed in-graph;
* the refer1/refer2 coin flip (model3.py:1231-1234) happens on host per
  step, keeping batch shapes static;
* metrics accumulate on device; host sync only at logging boundaries
  (the reference's per-parameter ``.item()`` grad-norm probe,
  model3.py:1266-1275, becomes one fused global-norm reduction);
* checkpoints include optimizer state and resume exactly.
"""
from __future__ import annotations

import dataclasses
import functools
import os
import random
import time
from datetime import datetime
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from diff_vits_tpu.core.config import Config
from diff_vits_tpu.data.dataset import Batch, TextMelDataset, TrainLoader
from diff_vits_tpu.models.diff_vits import DiffVits, synthesize
from diff_vits_tpu.parallel import mesh as mesh_lib
from diff_vits_tpu.text.symbols import symbols
from diff_vits_tpu.train import checkpoint as ckpt_lib


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    return optax.adamw(cfg.train.train_lr, b1=cfg.train.adam_betas[0],
                       b2=cfg.train.adam_betas[1], eps=cfg.train.eps)


def clip_by_global_norm_scheduled(grads, step, cfg: Config):
    """Global-norm clip with the reference's 10.0 -> 1.0 schedule."""
    max_norm = jnp.where(step < cfg.train.clip_switch_step,
                         cfg.train.clip_before, cfg.train.clip_after)
    g_norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (g_norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads), g_norm


def clip_grad_value(grads, clip_value, norm_type: float = 2.0):
    """Element-wise value clip returning the pre-clip total norm
    (commons.py:146-161 semantics; the reference sums per-param
    norms^p over all params, which equals the global p-norm)."""
    leaves = jax.tree_util.tree_leaves(grads)
    total = sum(jnp.sum(jnp.abs(l).astype(jnp.float32) ** norm_type)
                for l in leaves) ** (1.0 / norm_type)
    if clip_value is not None:
        grads = jax.tree_util.tree_map(
            lambda g: jnp.clip(g, -clip_value, clip_value), grads)
    return grads, total


def dropout_key(rng, impl: str):
    """Derive the per-step dropout PRNG key.

    ``impl='rbg'`` re-wraps the derived key for the TPU hardware RNG:
    threefry dropout masks cost ~hundreds of VPU int-ops per random bit
    (measured 618 GF/step of the b=32 training forward's 1.9 TF — 32%);
    rbg generates them at memory speed. Only the dropout stream changes —
    model-semantics noise stays on the caller's threefry key.
    """
    k = jax.random.fold_in(rng, 1)
    if impl == "rbg":
        data = jax.random.key_data(k)  # [2] uint32
        k = jax.random.wrap_key_data(
            jnp.concatenate([data, data]), impl="rbg")
    return k


def make_loss_fn(model: DiffVits, cfg: Config):
    """The training loss (params, batch, rng, mas_noise_scale) ->
    (loss, metrics), with the configured rematerialization policy applied.

    jax.checkpoint trades recompute FLOPs for saved-activation bytes (the
    b=32 production step is HBM-bound, bench.py mfu roofline): 'dots'
    keeps matmul outputs and recomputes elementwise chains in the backward
    pass; 'full' saves only the inputs. Exposed separately so tests can
    compare raw gradients across policies (ADVICE r4)."""

    def loss_fn(params, batch, rng, mas_noise_scale):
        loss, (metrics, _, _) = model.apply(
            {"params": params}, batch["text"], batch["text_lengths"],
            batch["spec"], batch["spec_lengths"], batch["refer"],
            batch["refer_lengths"], batch["tone"], batch["language"],
            rng=rng, mas_noise_scale=mas_noise_scale, deterministic=False,
            rngs={"dropout": dropout_key(
                rng, cfg.train.dropout_rng_impl)})
        return loss, metrics

    if cfg.train.remat_policy == "dots":
        loss_fn = jax.checkpoint(
            loss_fn, policy=jax.checkpoint_policies.checkpoint_dots)
    elif cfg.train.remat_policy == "full":
        loss_fn = jax.checkpoint(loss_fn)
    elif cfg.train.remat_policy != "none":
        raise ValueError(
            f"unknown train.remat_policy {cfg.train.remat_policy!r}")
    return loss_fn


def make_train_step(model: DiffVits, tx: optax.GradientTransformation,
                    cfg: Config):
    """Build the jitted SPMD train step.

    state = {'params', 'opt_state', 'step', 'rng'}; batch is a dict of
    arrays sharded on the leading (batch) axis.
    """
    loss_fn = make_loss_fn(model, cfg)
    accum = max(1, cfg.train.gradient_accumulate_every)

    def train_step(state, batch):
        step = state["step"]
        rng = jax.random.fold_in(state["rng"], step)
        mas_noise_scale = jnp.maximum(
            cfg.train.mas_noise_scale_initial
            - cfg.train.noise_scale_delta * step, 0.0)
        if accum == 1:
            (loss, metrics), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state["params"], batch, rng,
                                       mas_noise_scale)
        else:
            # gradient accumulation (model3.py:1366-1374): batches carry a
            # leading accum axis; grads averaged in-graph via scan
            def micro(carry, inp):
                i, mb = inp
                (l, m), g = jax.value_and_grad(loss_fn, has_aux=True)(
                    state["params"], mb, jax.random.fold_in(rng, i),
                    mas_noise_scale)
                carry = jax.tree_util.tree_map(jnp.add, carry, g)
                return carry, (l, m)

            zeros = jax.tree_util.tree_map(jnp.zeros_like, state["params"])
            grads, (losses, metrics) = jax.lax.scan(
                micro, zeros, (jnp.arange(accum), batch))
            grads = jax.tree_util.tree_map(lambda g: g / accum, grads)
            metrics = jax.tree_util.tree_map(lambda m: m.mean(), metrics)
        grads, g_norm = clip_by_global_norm_scheduled(grads, step, cfg)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        params = optax.apply_updates(state["params"], updates)
        metrics["loss/grad"] = g_norm
        new_state = {"params": params, "opt_state": opt_state,
                     "step": step + 1, "rng": state["rng"]}
        if "ema_params" in state:
            d = cfg.train.ema_decay
            new_state["ema_params"] = jax.tree_util.tree_map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                state["ema_params"], params)
        return new_state, metrics

    return train_step


class Trainer:
    """End-to-end training driver (reference Trainer parity)."""

    def __init__(self, cfg: Config, workdir: Optional[str] = None,
                 dataset: Optional[TextMelDataset] = None):
        self.cfg = cfg
        mesh_lib.initialize_distributed()
        self.mesh = mesh_lib.make_mesh(cfg.train.mesh_shape,
                                       cfg.train.mesh_axes)
        n_data = self.mesh.shape.get("data", 1)
        if cfg.train.train_batch_size % max(1, n_data):
            raise ValueError(
                f"train.train_batch_size={cfg.train.train_batch_size} must "
                f"be divisible by the mesh 'data' axis ({n_data} of "
                f"{jax.device_count()} devices) — the global batch shards "
                "over that axis")
        dtype = jnp.bfloat16 if cfg.train.compute_dtype == "bfloat16" \
            else jnp.float32
        self.model = DiffVits(cfg, n_vocab=len(symbols), dtype=dtype)
        self.tx = make_optimizer(cfg)

        now = datetime.now().strftime("%Y-%m-%d-%H-%M-%S")
        self.logs_folder = workdir or os.path.join(cfg.train.logs_folder, now)
        if jax.process_index() == 0:
            os.makedirs(self.logs_folder, exist_ok=True)

        self.ds = dataset or TextMelDataset(cfg)
        self.loader = self._make_loader()
        self._py_rng = random.Random(cfg.train.seed + 17)

        # init state (jitted: eager init would execute op-by-op, which is
        # pathologically slow through a remote-device tunnel)
        key = jax.random.PRNGKey(cfg.train.seed)
        init_batch = self._dummy_batch()

        @jax.jit
        def _init(key, b):
            return self.model.init(
                {"params": key, "dropout": key}, b["text"],
                b["text_lengths"], b["spec"], b["spec_lengths"], b["refer"],
                b["refer_lengths"], b["tone"], b["language"],
                rng=key)["params"]

        params = _init(key, init_batch)
        opt_state = self.tx.init(params)
        self.state = {"params": params, "opt_state": opt_state,
                      "step": jnp.asarray(0, jnp.int32), "rng": key}
        if cfg.train.use_ema:
            # jnp.array(copy=True), NOT astype: astype(float32) on fp32
            # params is a no-op returning the SAME buffer, and a state
            # whose ema_params alias params crashes the donated step with
            # "Attempt to donate the same buffer twice" at execute time
            self.state["ema_params"] = jax.tree_util.tree_map(
                lambda p: jnp.array(p, jnp.float32, copy=True), params)

        train_step = make_train_step(self.model, self.tx, cfg)
        repl = mesh_lib.replicated_sharding(self.mesh)
        self.accum = max(1, cfg.train.gradient_accumulate_every)
        if self.accum == 1:
            data_sh = mesh_lib.batch_sharding(self.mesh)
        else:
            from jax.sharding import NamedSharding, PartitionSpec as P
            data_sh = NamedSharding(self.mesh, P(None, "data"))
        self._data_sh = data_sh
        # params/opt-state: replicated for DP, Megatron col/row-sharded over
        # the 'model' axis when the mesh has one
        state_sh = mesh_lib.state_sharding_rules(self.mesh, self.state)
        batch_sh = {k: data_sh for k in
                    ("text", "tone", "language", "spec", "refer",
                     "text_lengths", "spec_lengths", "refer_lengths")}
        self.train_step = jax.jit(
            train_step,
            in_shardings=(state_sh, batch_sh),
            out_shardings=(state_sh, repl),
            donate_argnums=(0,))
        self.state = jax.device_put(self.state, state_sh)

    def _make_loader(self, batch_size=None, seed=None):
        """Native C++/OpenMP loader when buildable and the dataset has .npy
        mel sidecars; pure-Python TrainLoader otherwise."""
        kw = dict(batch_size=batch_size,
                  seed=self.cfg.train.seed if seed is None else seed,
                  host_id=jax.process_index(),
                  num_hosts=jax.process_count())
        if self.cfg.train.use_native_loader:
            try:
                from diff_vits_tpu.data.native_loader import NativeTrainLoader
                loader = NativeTrainLoader(self.ds, self.cfg, **kw)
                if len(loader) > 0:
                    self.loader_kind = "native"
                    print("loader: native C++ (csrc/loader.cc)", flush=True)
                    return loader
                reason = "no .npy mel sidecars in the dataset"
            except Exception as e:  # noqa: BLE001 — toolchain missing
                reason = f"{type(e).__name__}: {e}"
            # never fall back silently: a run must record which input
            # pipeline fed it (VERDICT.md weak #3)
            print(f"loader: python fallback ({reason})", flush=True)
        self.loader_kind = "python"
        return TrainLoader(self.ds, self.cfg, **kw)

    def _dummy_batch(self, b: int = 2):
        c = self.cfg.data.n_mel_channels
        tl = self.cfg.data.max_text_len * 2 + 1 if self.cfg.data.add_blank \
            else self.cfg.data.max_text_len
        ty = self.cfg.data.max_mel_len
        s = ty * 2 // 3 + 1
        return {
            "text": np.zeros((b, tl), np.int32),
            "tone": np.zeros((b, tl), np.int32),
            "language": np.zeros((b, tl), np.int32),
            "spec": np.zeros((b, ty, c), np.float32),
            "refer": np.zeros((b, s, c), np.float32),
            "text_lengths": np.full(b, tl, np.int32),
            "spec_lengths": np.full(b, ty, np.int32),
            "refer_lengths": np.full(b, s, np.int32),
        }

    # -- checkpoint --------------------------------------------------------

    def save(self, step: int):
        # gather BEFORE the process gate: with TP/FSDP-sharded state on a
        # multi-host mesh this is a collective all hosts must enter
        payload = {"params": self.state["params"],
                   "opt_state": self.state["opt_state"]}
        if "ema_params" in self.state:
            payload["ema_params"] = self.state["ema_params"]
        payload = ckpt_lib.gather_for_save(payload)
        if jax.process_index() != 0:
            return
        ckpt_lib.save_checkpoint(self.logs_folder, step, payload,
                                 keep=self.cfg.train.keep_ckpts)

    def load(self, path: str):
        step, saved = ckpt_lib.load_checkpoint(path)
        from flax import serialization
        params = serialization.from_state_dict(
            jax.device_get(self.state["params"]), saved["params"])
        if "opt_state" in saved:
            opt_state = serialization.from_state_dict(
                jax.device_get(self.state["opt_state"]), saved["opt_state"])
        else:
            # params-only checkpoint (e.g. converted from the reference,
            # which never saves optimizer state — model3.py:1329-1332)
            opt_state = self.tx.init(params)
        new_state = {"params": params, "opt_state": opt_state,
                     "step": jnp.asarray(step, jnp.int32),
                     "rng": self.state["rng"]}
        if self.cfg.train.use_ema:
            if "ema_params" in saved:
                new_state["ema_params"] = serialization.from_state_dict(
                    jax.device_get(self.state["params"]),
                    saved["ema_params"])
            else:
                # copy, not astype: aliased ema/params buffers break the
                # donated step (see __init__)
                new_state["ema_params"] = jax.tree_util.tree_map(
                    lambda p: jnp.array(p, jnp.float32, copy=True), params)
        self.state = jax.device_put(
            new_state, mesh_lib.state_sharding_rules(self.mesh, new_state))

    # -- loop --------------------------------------------------------------

    def _host_batch(self, batch: Batch) -> Dict[str, Any]:
        # refer1/refer2 coin flip (model3.py:1231-1234), host-side
        if self._py_rng.random() < 0.5:
            refer, refer_lengths = batch.refer1, batch.refer1_lengths
        else:
            refer, refer_lengths = batch.refer2, batch.refer2_lengths
        return {
            "text": batch.text, "tone": batch.tone,
            "language": batch.language, "spec": batch.spec,
            "refer": refer,
            "text_lengths": batch.text_lengths,
            "spec_lengths": batch.spec_lengths,
            "refer_lengths": refer_lengths,
        }

    def _next_device_batch(self, it) -> Dict[str, Any]:
        if self.accum == 1:
            d = self._host_batch(next(it))
        else:
            micro = [self._host_batch(next(it)) for _ in range(self.accum)]
            d = {k: np.stack([m[k] for m in micro]) for k in micro[0]}
        return {k: jax.device_put(v, self._data_sh) for k, v in d.items()}

    def _prefetch(self, it, depth: int = 2):
        """Double-buffered device-batch iterator: host batch assembly and
        H2D transfer overlap the previous step's compute (the reference
        blocks on ``data.to(device)`` every step, model3.py:1367-1368)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        stop = threading.Event()

        def worker():
            try:
                while not stop.is_set():
                    q.put(self._next_device_batch(it))
            except BaseException as e:  # surface errors on the main thread
                q.put(e)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()

    def resume_latest(self) -> bool:
        """Auto-resume from the newest checkpoint in the workdir (the
        reference requires a manual trainer.load edit, train.py:4)."""
        path = ckpt_lib.latest_checkpoint_path(self.logs_folder)
        if path:
            self.load(path)
            print(f"resumed from {path} at step {int(self.state['step'])}")
            return True
        return False

    def start_profiler(self, port: int = 9999):
        """jax.profiler trace server (SURVEY.md §5.1 — the reference has no
        profiling at all; its grad-norm probe syncs the host every step)."""
        jax.profiler.start_server(port)

    def train(self, num_steps: Optional[int] = None, log_every: int = 100):
        try:
            from tensorboardX import SummaryWriter
            writer = (SummaryWriter(self.logs_folder)
                      if jax.process_index() == 0 else None)
        except ImportError:
            writer = None
        num_steps = num_steps or self.cfg.train.train_num_steps
        log_every = max(1, min(log_every, num_steps))
        batches = self._prefetch(iter(self.loader))
        t0 = time.time()
        step = int(self.state["step"])

        # preemption handling (SURVEY.md §5.3 — the reference has none):
        # TPU VMs get SIGTERM ahead of eviction; finish the in-flight step,
        # checkpoint, and exit cleanly so auto-resume continues the run
        import signal
        preempted = {"flag": False}

        def _on_term(signum, frame):
            preempted["flag"] = True
            print(f"signal {signum}: checkpointing at the next step "
                  "boundary", flush=True)

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _on_term)
            except ValueError:  # non-main thread (tests)
                pass

        while step < num_steps and not preempted["flag"]:
            batch = next(batches)
            try:
                self.state, metrics = self.train_step(self.state, batch)
            except Exception:
                # failure containment (SURVEY.md §5.3 — the reference has
                # none): best-effort checkpoint. The step's input buffers
                # are donated, so when the failure happened at execution
                # time the state may already be gone — never let the save
                # attempt mask the root cause.
                try:
                    self.save(step)
                except Exception as save_err:
                    print(f"crash checkpoint failed (state donated to the "
                          f"failing step): {save_err}", flush=True)
                raise
            step += 1
            if step % log_every == 0:
                metrics = jax.device_get(metrics)
                if not np.isfinite(float(metrics["loss/all"])):
                    # NaN tripwire (the reference sprinkles asserts through
                    # forward passes, model3.py:305-317; we check the fused
                    # loss at logging boundaries to avoid per-step syncs)
                    self.save(step)
                    raise FloatingPointError(
                        f"non-finite loss at step {step}: {metrics}")
                dt = time.time() - t0
                t0 = time.time()
                sps = log_every / dt
                if jax.process_index() == 0:
                    line = " ".join(f"{k}={float(v):.4f}"
                                    for k, v in sorted(metrics.items()))
                    print(f"step {step} {line} steps/s={sps:.2f}", flush=True)
                    if writer is not None:
                        for k, v in metrics.items():
                            writer.add_scalar(k, float(v), step)
                        writer.add_scalar("perf/steps_per_sec", sps, step)
            if step % self.cfg.train.save_and_sample_every == 0:
                self.save(step)
                # SPMD: ALL processes enter the jitted eval computation
                # (params span the global mesh); only process 0 writes
                # artifacts (inside eval_sample)
                try:
                    self.eval_sample(step, writer)
                except Exception as e:  # never kill training on eval
                    print(f"eval_sample failed: {e}", flush=True)
        for sig, h in old_handlers.items():
            signal.signal(sig, h)
        if step % self.cfg.train.save_and_sample_every != 0:
            self.save(step)  # final checkpoint at loop exit (or preemption)
        if preempted["flag"]:
            print(f"preempted: checkpointed at step {step}; rerun to "
                  "auto-resume", flush=True)
        else:
            print("training complete")

    def _eval_batch(self):
        """One batch from the eval set (built once, cached). The reference
        keeps a separate eval_dl over val_files (model3.py:1417); we build
        an eval dataset from cfg.data.val_files (falling back to the
        training set when it's the same path or empty)."""
        if not hasattr(self, "_eval_loader"):
            ds = self.ds
            if self.cfg.data.val_files != self.cfg.data.training_files:
                val_ds = TextMelDataset(self.cfg,
                                        root=self.cfg.data.val_files)
                if len(val_ds) > 0:
                    ds = val_ds
            # identical eval batch on every host (no host sharding): in
            # SPMD all processes run the same computation and process 0
            # writes artifacts
            kw = dict(batch_size=1, seed=self.cfg.train.seed + 1)
            try:
                from diff_vits_tpu.data.native_loader import NativeTrainLoader
                loader = (NativeTrainLoader(ds, self.cfg, **kw)
                          if self.cfg.train.use_native_loader else None)
                if not loader or len(loader) == 0:
                    raise ValueError
            except Exception:
                loader = TrainLoader(ds, self.cfg, **kw)
            self._eval_loader = loader
        batch = next(iter(self._eval_loader))
        # always refer1 for eval (no coin flip): the fixed-t eval loss and
        # mel metrics must be comparable across evals, and the training
        # coin flip would silently swap the prompt between them
        return {
            "text": batch.text, "tone": batch.tone,
            "language": batch.language, "spec": batch.spec,
            "refer": batch.refer1,
            "text_lengths": batch.text_lengths,
            "spec_lengths": batch.spec_lengths,
            "refer_lengths": batch.refer1_lengths,
        }

    def eval_fixed_t_loss(self, batch, t_fracs=(0.1, 0.3, 0.5, 0.7, 0.9)
                          ) -> Dict[str, float]:
        """Deterministic eval diffusion loss on a fixed timestep grid with
        fixed noise (VERDICT r4 #2a): the training loss draws t uniformly
        per step, so its logged value bounces by orders of magnitude
        between adjacent steps (the SNR loss weight spans ~1e3 over t) —
        this fixes {t, noise, posterior noise} so successive evals are
        comparable and a converging run produces a monotone-ish curve."""
        if not hasattr(self, "_eval_loss_fn"):
            def _loss_at_t(params, b, t_scalar, noise):
                t = jnp.full((b["spec"].shape[0],), t_scalar, jnp.int32)
                _, (metrics, _, _) = self.model.apply(
                    {"params": params}, b["text"], b["text_lengths"],
                    b["spec"], b["spec_lengths"], b["refer"],
                    b["refer_lengths"], b["tone"], b["language"],
                    rng=None, t=t, noise=noise, deterministic=True)
                return metrics["loss/diff"]

            self._eval_loss_fn = jax.jit(_loss_at_t)
        dev_batch = {k: jnp.asarray(v) for k, v in batch.items()}
        noise = jax.random.normal(
            jax.random.PRNGKey(self.cfg.train.seed + 2),
            dev_batch["spec"].shape, jnp.float32)
        T = self.cfg.train.timesteps
        # RAW params are the primary eval subject (the reference evals the
        # training model, model3.py:1417): with ema_decay=0.9999 the EMA
        # tree is still ~95% random init after 500 steps, which made the
        # first recommended-config smoke read as 'no progress'
        out = {}
        per_t = []
        for f in t_fracs:
            t_val = jnp.asarray(int(f * T), jnp.int32)
            v = float(self._eval_loss_fn(
                self.state["params"], dev_batch, t_val, noise))
            out[f"eval/diff_t{f:g}"] = v
            per_t.append(v)
        out["eval/diff_fixed_t"] = float(np.mean(per_t))
        if "ema_params" in self.state:
            # one summary row for the EMA tree so its warm-up is visible
            ema_vals = [float(self._eval_loss_fn(
                self.state["ema_params"], dev_batch,
                jnp.asarray(int(f * T), jnp.int32), noise))
                for f in t_fracs]
            out["eval/ema_diff_fixed_t"] = float(np.mean(ema_vals))
        return out

    def eval_sample(self, step: int, writer=None, sampling_steps: int = 30):
        """Periodic eval synthesis (model3.py:1417-1447): sample one
        utterance with the training prompt and log mel image + artifact
        (+ waveform via the Vocos port when train.vocoder_ckpt is set,
        model3.py:1432-1447). Also logs objective metrics — mel L1 +
        correlation of the generated sample vs the utterance's ground
        truth over their overlapping frames, and the fixed-t eval
        diffusion loss — so convergence is machine-checkable rather than
        image-eyeballed (VERDICT r4 #7)."""
        from diff_vits_tpu.models.diff_vits import synthesize

        batch = self._eval_batch()
        if not hasattr(self, "_eval_fn"):
            # jitted (and cached): eager synthesis would dispatch op-by-op
            self._eval_fn = jax.jit(functools.partial(
                synthesize, self.model, sampling_steps=sampling_steps,
                max_len=self.cfg.data.max_mel_len))
        # raw params, not EMA: the sample must reflect the training model
        # (the slow-decay EMA tree lags it by thousands of steps; its
        # fixed-t loss is tracked separately as eval/ema_diff_fixed_t)
        mel, lengths = self._eval_fn(
            {"params": self.state["params"]},
            jnp.asarray(batch["text"]), jnp.asarray(batch["text_lengths"]),
            jnp.asarray(batch["refer"]), jnp.asarray(batch["refer_lengths"]),
            jnp.asarray(batch["tone"]), jnp.asarray(batch["language"]),
            key=jax.random.fold_in(self.state["rng"], step))
        # all processes enter the jitted eval-loss computation (SPMD)
        eval_metrics = self.eval_fixed_t_loss(batch)
        if jax.process_index() != 0:
            jax.block_until_ready(mel)
            return
        mel_np = np.asarray(mel[0, :int(lengths[0])], np.float32)
        gt_np = np.asarray(
            batch["spec"][0][:int(batch["spec_lengths"][0])], np.float32)
        n = min(len(mel_np), len(gt_np))
        if n > 0:
            eval_metrics["eval/mel_l1"] = float(
                np.mean(np.abs(mel_np[:n] - gt_np[:n])))
            denom = mel_np[:n].std() * gt_np[:n].std()
            eval_metrics["eval/mel_corr"] = float(
                np.corrcoef(mel_np[:n].ravel(), gt_np[:n].ravel())[0, 1]
            ) if denom > 0 else 0.0
        self.last_eval_metrics = eval_metrics
        print("eval step {} {}".format(step, " ".join(
            f"{k.split('/', 1)[1]}={v:.4f}"
            for k, v in sorted(eval_metrics.items()))), flush=True)
        milestone = step // self.cfg.train.save_and_sample_every
        np.save(os.path.join(self.logs_folder,
                             f"sample-{milestone}.mel.npy"), mel_np)
        wav = None
        if self.cfg.train.vocoder_ckpt:
            # waveform eval artifact (model3.py:1432-1447 writes
            # sample-{milestone}.wav + TB audio every eval)
            if not hasattr(self, "_vocoder"):
                from diff_vits_tpu.models.vocoder import load_vocoder
                voc, vparams = load_vocoder(self.cfg,
                                            self.cfg.train.vocoder_ckpt)
                self._vocoder = (
                    jax.jit(lambda m: voc.apply({"params": vparams}, m)))
            wav = np.asarray(self._vocoder(jnp.asarray(mel_np[None]))[0],
                             np.float32)
            from diff_vits_tpu.data.audio import write_wav
            write_wav(os.path.join(self.logs_folder,
                                   f"sample-{milestone}.wav"),
                      wav, self.cfg.data.sampling_rate)
        if writer is not None:
            from diff_vits_tpu.utils.logging import plot_spectrogram_to_numpy
            for k, v in eval_metrics.items():
                writer.add_scalar(k, v, step)
            writer.add_image("gen/mel",
                             plot_spectrogram_to_numpy(mel_np.T), step,
                             dataformats="HWC")
            writer.add_image("gt/mel",
                             plot_spectrogram_to_numpy(gt_np.T), step,
                             dataformats="HWC")
            if wav is not None:
                writer.add_audio("gen/audio", wav[None, :], step,
                                 sample_rate=self.cfg.data.sampling_rate)
