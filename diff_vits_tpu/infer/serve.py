"""Batched serving driver: manifest -> bucketed batches -> mel (-> wav).

The reference has no batch inference path at all (`tts_infer.py` is
single-utterance, one process per call). TPU-first serving instead:

* utterances are grouped into **static text-length buckets** so each bucket
  shape compiles exactly once (the persistent compilation cache makes that
  once-per-machine);
* every batch is padded to its bucket's full [batch_size, T_bucket] shape —
  short batches are padded with repeats of the last row and the extra
  outputs dropped, so no shape ever recompiles;
* prompts are padded/cropped to one static frame count; the prompt encoder
  runs once per utterance inside the scan-compiled sampler program
  (docs/DESIGN.md "Serving-time specialization");
* the whole bucket batch rides one `synthesize` call: ~31 UNet calls for
  30-step UniPC regardless of batch size, so per-utterance cost drops
  nearly linearly until the chip saturates (measured 362x -> ~520x
  real-time from batch 1 -> 8 on v5e, docs/bench/serving_r04.txt);
* **mel-length buckets**: a cheap duration-only pass first predicts each
  utterance's frame count and assigns the smallest bucket that holds it
  (default max_mel_len x {1,2,4}), so long utterances get a bigger
  static shape instead of truncating — the reference generates
  unbounded ceil(sum w) frames (model3.py:842-847);
* optional `--vocoder_ckpt` decodes each bucket batch through the Vocos
  port and writes per-utterance wavs (model3.py:1195-1203);
* `--dp` shards every bucket batch over a `data` mesh axis spanning all
  local devices (params replicated): serving throughput scales with chip
  count with zero collectives in the graph — the reference is strictly
  single-GPU at inference.

Manifest: one utterance per line, tab-separated:
    utt_id <TAB> text <TAB> language(ZH|EN|JA) <TAB> refer_wav_path

Usage:
  python -m diff_vits_tpu.infer.serve --manifest utts.tsv \
      -c config.json -m logs/tts/<run>/model-<step>.ckpt --batch_size 8 \
      [--mel_buckets 400,800,1600] [--vocoder_ckpt vocos.bin]
"""
from __future__ import annotations

import argparse
import functools
import os
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from diff_vits_tpu.core.config import Config, load_config
from diff_vits_tpu.models.diff_vits import DiffVits, synthesize
from diff_vits_tpu.text.symbols import symbols
from diff_vits_tpu.train import checkpoint as ckpt_lib


def read_manifest(path: str) -> List[Dict[str, str]]:
    rows = []
    with open(path, encoding="utf-8") as f:
        for ln, line in enumerate(f, 1):
            line = line.rstrip("\n")
            if not line or line.startswith("#"):
                continue
            parts = line.split("\t")
            if len(parts) != 4:
                raise ValueError(
                    f"{path}:{ln}: expected 4 tab-separated fields "
                    f"(id, text, lang, refer), got {len(parts)}")
            rows.append(dict(zip(("utt_id", "text", "lang", "refer"), parts)))
    return rows


def pick_bucket(n: int, buckets: Sequence[int]) -> int:
    for b in sorted(buckets):
        if n <= b:
            return b
    raise ValueError(f"text length {n} exceeds largest bucket "
                     f"{max(buckets)}")


def pad_to(a: np.ndarray, n: int, axis: int = 0) -> np.ndarray:
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, n - a.shape[axis])
    return np.pad(a, pad)


class BatchSynthesizer:
    """Loads a checkpoint once and synthesizes manifests in bucketed
    batches. Reusable across calls (a long-running server would keep one
    instance alive; every distinct bucket shape compiles once)."""

    def __init__(self, cfg: Config, params, *, batch_size: int = 8,
                 steps: int = 30, sample_method: str = "unipc",
                 noise_scale: float = 0.667, length_scale: float = 1.0,
                 text_buckets: Optional[Sequence[int]] = None,
                 refer_frames: Optional[int] = None,
                 max_len: Optional[int] = None,
                 mel_buckets: Optional[Sequence[int]] = None,
                 vocoder=None,
                 mesh=None,
                 dtype=jnp.bfloat16):
        self.cfg = cfg
        self.batch_size = batch_size
        self.model = DiffVits(cfg, n_vocab=len(symbols), dtype=dtype)
        if dtype == jnp.bfloat16:
            # bf16 HBM weight residency: halves the per-denoise-step
            # parameter reads the sampler is bound on (core/params.py)
            from diff_vits_tpu.core.params import cast_float_params
            params = cast_float_params(params, dtype)
        # DP-sharded serving (VERDICT r4 #4): with a mesh, every bucket
        # batch is sharded over the 'data' axis (params replicated) and one
        # synthesize call fans the batch out over all chips — GSPMD inserts
        # no collectives in this embarrassingly-parallel graph, so per-chip
        # cost matches single-chip serving at batch_size/n_data. Outputs
        # stay per-utterance (gathered on fetch; single-host addressable).
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            n_data = mesh.shape.get("data", 1)
            if batch_size % max(1, n_data):
                raise ValueError(
                    f"batch_size={batch_size} must be divisible by the mesh "
                    f"'data' axis ({n_data}) — each bucket batch shards "
                    "over that axis")
            self._data_sh = NamedSharding(mesh, P("data"))
            params = jax.device_put(params, NamedSharding(mesh, P()))
        self.params = params
        t_max = cfg.data.max_text_len * (2 if cfg.data.add_blank else 1) + 1
        self.text_buckets = tuple(text_buckets) if text_buckets else tuple(
            b for b in (64, 128, 256, t_max) if b <= t_max) or (t_max,)
        self.refer_frames = refer_frames or cfg.data.max_mel_len * 2 // 3 + 1
        # mel-length buckets: the reference generates ceil(sum w) frames
        # unbounded (model3.py:842-847); under jit the mel buffer is static,
        # so we first run the cheap duration pass, then place each utterance
        # in the smallest bucket holding its predicted length. ``max_len``
        # forces a single legacy bucket instead.
        m = cfg.data.max_mel_len
        if max_len is not None:
            self.mel_buckets = (max_len,)
        else:
            self.mel_buckets = tuple(sorted(mel_buckets)) if mel_buckets \
                else (m, 2 * m, 4 * m)
        self.vocoder = vocoder  # None or (module, params)
        self._runs: Dict[int, callable] = {}
        for t_y in self.mel_buckets:
            self._runs[t_y] = jax.jit(functools.partial(
                synthesize, self.model, sampling_steps=steps,
                sample_method=sample_method, noise_scale=noise_scale,
                length_scale=length_scale, max_len=t_y))
        self._predict = jax.jit(functools.partial(
            self.model.apply, length_scale=length_scale,
            method=DiffVits.predict_lengths))
        if vocoder is not None:
            voc, _ = vocoder
            self._decode = jax.jit(
                lambda vp, m: voc.apply({"params": vp}, m))

    def _prep_text(self, text: str, lang: str):
        from diff_vits_tpu.infer.tts_infer import preprocess_text
        phone, tone, language = preprocess_text(text, lang,
                                                self.cfg.data.add_blank)
        return phone[0], tone[0], language[0]

    def _prep_refer(self, path: str) -> np.ndarray:
        from diff_vits_tpu.infer.tts_infer import load_refer_mel
        mel = load_refer_mel(path, self.cfg)[0]
        s = self.refer_frames
        if mel.shape[0] >= s:
            return mel[:s].astype(np.float32)
        return pad_to(mel.astype(np.float32), s)

    def _batch_arrays(self, chunk, t_bucket):
        """Pad a chunk of items to one static [batch_size, t_bucket] batch
        (batch dim padded with repeats of the last row)."""
        full = chunk + [chunk[-1]] * (self.batch_size - len(chunk))
        text = np.stack([pad_to(c[2], t_bucket) for c in full])
        tone = np.stack([pad_to(c[3], t_bucket) for c in full])
        lang = np.stack([pad_to(c[4], t_bucket) for c in full])
        refer = np.stack([c[5] for c in full])
        text_lengths = np.array([len(c[2]) for c in full], np.int32)
        refer_lengths = np.full(self.batch_size, self.refer_frames, np.int32)
        args = (jnp.asarray(text, jnp.int32), jnp.asarray(text_lengths),
                jnp.asarray(refer, jnp.float32), jnp.asarray(refer_lengths),
                jnp.asarray(tone, jnp.int32), jnp.asarray(lang, jnp.int32))
        if self.mesh is not None:
            args = tuple(jax.device_put(a, self._data_sh) for a in args)
        return args

    def _predict_mel_buckets(self, by_text_bucket, seed: int
                             ) -> Dict[int, int]:
        """Run the duration pass per text-bucket batch; map item index ->
        mel bucket. With one mel bucket the pass is skipped entirely."""
        if len(self.mel_buckets) == 1:
            return {}
        assign: Dict[int, int] = {}
        top = self.mel_buckets[-1]
        key = jax.random.PRNGKey(seed)
        # the stochastic duration predictor re-draws its noise inside
        # synthesize from a different key than this pre-pass, so the
        # realized duration can exceed the pre-pass draw — bucket with 10%
        # headroom so near-boundary utterances don't silently truncate
        # (ADVICE r4; the default 'unet' predictor is deterministic)
        headroom = 1.1 if self.cfg.vits.duration_predictor == "sdp" else 1.0
        for t_bucket, group in sorted(by_text_bucket.items()):
            for off in range(0, len(group), self.batch_size):
                chunk = group[off:off + self.batch_size]
                args = self._batch_arrays(chunk, t_bucket)
                lens = np.asarray(self._predict(
                    self.params, *args,
                    noise_key=jax.random.fold_in(key, t_bucket + off)))
                for j, c in enumerate(chunk):
                    n = int(np.ceil(headroom * float(lens[j])))
                    if n > top:
                        print(f"warning: {c[1]} predicted {n} frames > "
                              f"largest mel bucket {top}; clamping",
                              flush=True)
                    assign[c[0]] = pick_bucket(min(n, top), self.mel_buckets)
        return assign

    def synthesize_all(self, rows: List[Dict[str, str]], *, seed: int = 0
                       ) -> List[Tuple]:
        """Returns [(utt_id, mel [T, n_mels])] in manifest order — or
        [(utt_id, mel, wav [T*hop])] when a vocoder is configured."""
        items = []
        refer_cache: Dict[str, np.ndarray] = {}
        for i, r in enumerate(rows):
            phone, tone, lang = self._prep_text(r["text"], r["lang"])
            if r["refer"] not in refer_cache:
                refer_cache[r["refer"]] = self._prep_refer(r["refer"])
            items.append((i, r["utt_id"], phone, tone, lang,
                          refer_cache[r["refer"]]))

        # group by text bucket for the duration pass
        by_text: Dict[int, list] = {}
        for it in items:
            b = pick_bucket(len(it[2]), self.text_buckets)
            by_text.setdefault(b, []).append(it)
        mel_assign = self._predict_mel_buckets(by_text, seed)

        # regroup by (text bucket, mel bucket): each pair is one static
        # compiled shape; long utterances land in bigger mel buckets instead
        # of truncating at max_mel_len (VERDICT r3 missing #3)
        by_shape: Dict[Tuple[int, int], list] = {}
        for t_bucket, group in by_text.items():
            for it in group:
                m_bucket = mel_assign.get(it[0], self.mel_buckets[0])
                by_shape.setdefault((t_bucket, m_bucket), []).append(it)

        out: List[Optional[Tuple]] = [None] * len(items)
        for (t_bucket, m_bucket), group in sorted(by_shape.items()):
            for off in range(0, len(group), self.batch_size):
                chunk = group[off:off + self.batch_size]
                args = self._batch_arrays(chunk, t_bucket)
                # fold_in data must fit uint32: big (text, mel) bucket
                # pairs overflow the raw product (601*131+800)*100003
                fold = ((t_bucket * 131 + m_bucket) * 100003 + off) % (2**31)
                mel, out_lengths = self._runs[m_bucket](
                    self.params, *args,
                    key=jax.random.fold_in(jax.random.PRNGKey(seed), fold))
                wav = None
                if self.vocoder is not None:
                    # batched decode at the bucket's static shape; trimmed
                    # per utterance below (model3.py:1195-1203)
                    wav = np.asarray(self._decode(self.vocoder[1], mel),
                                     np.float32)
                mel = np.asarray(mel, np.float32)
                lens = np.asarray(out_lengths)
                hop = self.cfg.data.hop_length
                for j, c in enumerate(chunk):
                    n = int(lens[j])
                    if wav is None:
                        out[c[0]] = (c[1], mel[j, :n])
                    else:
                        out[c[0]] = (c[1], mel[j, :n],
                                     wav[j, :min(n * hop, wav.shape[1])])
        return [o for o in out if o is not None]


def main(argv=None):
    from diff_vits_tpu.core.cache import enable_compilation_cache
    enable_compilation_cache()
    p = argparse.ArgumentParser()
    p.add_argument("--manifest", type=str, required=True)
    p.add_argument("-c", "--config_path", type=str, default="config.json")
    p.add_argument("-m", "--model_path", type=str, required=True)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--steps", type=int, default=30)
    p.add_argument("--sample_method", type=str, default="unipc",
                   choices=["unipc", "dpmsolver", "ddim", "ddpm"])
    p.add_argument("--noise_scale", type=float, default=0.667)
    p.add_argument("--length_scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--out_dir", type=str, default="output")
    p.add_argument("--text_buckets", type=str, default=None,
                   help="comma-separated, e.g. 64,128,256")
    p.add_argument("--mel_buckets", type=str, default=None,
                   help="comma-separated mel-frame buckets, e.g. "
                        "400,800,1600 (default: max_mel_len x {1,2,4}); "
                        "long utterances pick a bigger bucket from a cheap "
                        "duration pass instead of truncating")
    p.add_argument("--vocoder_ckpt", type=str, default=None,
                   help="Vocos weights (torch .bin/.pt converted on the "
                        "fly, or our .ckpt); enables .wav output")
    p.add_argument("--dtype", type=str, default="bfloat16",
                   choices=["bfloat16", "float32"],
                   help="serving precision (bf16 weight residency; "
                        "float32 for exact-parity runs)")
    p.add_argument("--dp", action="store_true",
                   help="shard each bucket batch over a 'data' mesh axis "
                        "spanning all local devices (batch_size must be "
                        "divisible by the device count)")
    args = p.parse_args(argv)

    cfg = load_config(args.config_path) if os.path.exists(args.config_path) \
        else Config()
    _, saved = ckpt_lib.load_checkpoint(args.model_path)
    params = {"params": saved["params"]}
    buckets = tuple(int(x) for x in args.text_buckets.split(",")) \
        if args.text_buckets else None
    mel_buckets = tuple(int(x) for x in args.mel_buckets.split(",")) \
        if args.mel_buckets else None
    vocoder = None
    if args.vocoder_ckpt:
        from diff_vits_tpu.models.vocoder import load_vocoder
        vocoder = load_vocoder(cfg, args.vocoder_ckpt)

    mesh = None
    if args.dp:
        from diff_vits_tpu.parallel import mesh as mesh_lib
        mesh = mesh_lib.make_mesh()

    rows = read_manifest(args.manifest)
    syn = BatchSynthesizer(cfg, params, batch_size=args.batch_size,
                           steps=args.steps,
                           sample_method=args.sample_method,
                           noise_scale=args.noise_scale,
                           length_scale=args.length_scale,
                           text_buckets=buckets,
                           mel_buckets=mel_buckets,
                           vocoder=vocoder,
                           mesh=mesh,
                           dtype=jnp.bfloat16 if args.dtype == "bfloat16"
                           else jnp.float32)
    os.makedirs(args.out_dir, exist_ok=True)
    for row in syn.synthesize_all(rows, seed=args.seed):
        utt_id, mel = row[0], row[1]
        path = os.path.join(args.out_dir, f"{utt_id}.mel.npy")
        np.save(path, mel)
        print(f"{utt_id}: {mel.shape} -> {path}", flush=True)
        if len(row) > 2:
            from diff_vits_tpu.data import audio as audio_lib
            wpath = os.path.join(args.out_dir, f"{utt_id}.wav")
            audio_lib.write_wav(wpath, row[2], cfg.data.sampling_rate)
            print(f"{utt_id}: wav -> {wpath}", flush=True)


if __name__ == "__main__":
    main()
