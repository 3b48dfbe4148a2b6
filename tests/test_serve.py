"""Batched serving driver: bucketing, batch padding, manifest round-trip."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diff_vits_tpu.core.config import (Config, DataConfig,
                                       DiffusionEncoderConfig, TrainConfig,
                                       VitsConfig)
from diff_vits_tpu.infer.serve import (BatchSynthesizer, pad_to, pick_bucket,
                                       read_manifest)
from diff_vits_tpu.models.diff_vits import DiffVits
from diff_vits_tpu.text.symbols import symbols


def _tiny_cfg():
    return Config(
        # timesteps >= 50: the reference beta schedule scales by 1000/T
        # (model3.py:935-942); fewer pushes beta past 1 -> NaN buffers
        train=TrainConfig(train_batch_size=2, timesteps=100,
                          compute_dtype="float32"),
        data=DataConfig(n_mel_channels=8, max_text_len=16, max_mel_len=24),
        diffusion_encoder=DiffusionEncoderConfig(
            in_channels=8, out_channels=8, hidden_channels=8, n_heads=2,
            block_out_channels=(8, 8), n_prompt_layers=1),
        vits=VitsConfig(inter_channels=8, hidden_channels=16,
                        filter_channels=16, n_heads=2, n_layers=2,
                        posterior_in_channels=8, posterior_n_layers=2),
    )


def test_pick_bucket_and_pad():
    assert pick_bucket(10, (16, 33)) == 16
    assert pick_bucket(17, (16, 33)) == 33
    with pytest.raises(ValueError):
        pick_bucket(40, (16, 33))
    a = np.ones((3, 2))
    assert pad_to(a, 5).shape == (5, 2)
    assert pad_to(a, 4, axis=1).shape == (3, 4)


def test_read_manifest(tmp_path):
    p = tmp_path / "m.tsv"
    p.write_text("# comment\nu0\thello.\tEN\tr0.wav\nu1\thi.\tEN\tr1.wav\n")
    rows = read_manifest(str(p))
    assert [r["utt_id"] for r in rows] == ["u0", "u1"]
    assert rows[0]["refer"] == "r0.wav"
    (tmp_path / "bad.tsv").write_text("only\ttwo\n")
    with pytest.raises(ValueError):
        read_manifest(str(tmp_path / "bad.tsv"))


@pytest.mark.slow  # two sampler compiles (one per text bucket)
def test_batch_synthesizer_buckets_and_order(tmp_path, monkeypatch):
    """Mixed-length manifest crosses buckets and batch chunks; outputs come
    back in manifest order with per-utterance lengths."""
    cfg = _tiny_cfg()
    model = DiffVits(cfg, n_vocab=len(symbols))
    b, t_x, t_y, s = 1, 8, 16, 8
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((b, t_x), jnp.int32), jnp.full((b,), t_x, jnp.int32),
        jnp.zeros((b, t_y, 8), jnp.float32), jnp.full((b,), t_y, jnp.int32),
        jnp.zeros((b, s, 8), jnp.float32), jnp.full((b,), s, jnp.int32),
        jnp.zeros((b, t_x), jnp.int32), jnp.zeros((b, t_x), jnp.int32),
        rng=key)["params"]

    syn = BatchSynthesizer(cfg, {"params": params}, batch_size=2, steps=3,
                           sample_method="ddim", text_buckets=(8, 16),
                           refer_frames=8, max_len=16)

    # stub the text/audio frontends: lengths drive the bucketing
    def fake_prep_text(text, lang):
        n = len(text)
        ids = (np.arange(n) % 20 + 1).astype(np.int32)
        return ids, np.zeros(n, np.int32), np.zeros(n, np.int32)

    rng = np.random.default_rng(0)

    def fake_prep_refer(path):
        return rng.normal(size=(8, 8)).astype(np.float32)

    monkeypatch.setattr(syn, "_prep_text",
                        lambda t, l: fake_prep_text(t, l))
    monkeypatch.setattr(syn, "_prep_refer", lambda p: fake_prep_refer(p))

    rows = [
        {"utt_id": "a", "text": "x" * 6, "lang": "EN", "refer": "r0"},
        {"utt_id": "b", "text": "x" * 14, "lang": "EN", "refer": "r0"},
        {"utt_id": "c", "text": "x" * 7, "lang": "EN", "refer": "r1"},
        {"utt_id": "d", "text": "x" * 5, "lang": "EN", "refer": "r0"},
        {"utt_id": "e", "text": "x" * 12, "lang": "EN", "refer": "r1"},
    ]
    out = syn.synthesize_all(rows, seed=1)
    assert [u for u, _ in out] == ["a", "b", "c", "d", "e"]
    for _, mel in out:
        assert mel.ndim == 2 and mel.shape[1] == 8
        assert 1 <= mel.shape[0] <= 16
        assert np.isfinite(mel).all()


@pytest.mark.slow  # two sampler compiles (sharded + unsharded)
def test_dp_sharded_serving_matches_single(monkeypatch):
    """DP-sharded serving (VERDICT r4 #4): a BatchSynthesizer given a mesh
    shards each bucket batch over the 'data' axis (8 virtual devices here)
    and produces the same per-utterance mels as the unsharded path."""
    from jax.sharding import Mesh

    cfg = _tiny_cfg()
    model = DiffVits(cfg, n_vocab=len(symbols))
    b, t_x, t_y, s = 1, 8, 16, 8
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((b, t_x), jnp.int32), jnp.full((b,), t_x, jnp.int32),
        jnp.zeros((b, t_y, 8), jnp.float32), jnp.full((b,), t_y, jnp.int32),
        jnp.zeros((b, s, 8), jnp.float32), jnp.full((b,), s, jnp.int32),
        jnp.zeros((b, t_x), jnp.int32), jnp.zeros((b, t_x), jnp.int32),
        rng=key)["params"]

    def fake_prep_text(text, lang):
        n = len(text)
        ids = (np.arange(n) % 20 + 1).astype(np.int32)
        return ids, np.zeros(n, np.int32), np.zeros(n, np.int32)

    def make(mesh):
        syn = BatchSynthesizer(cfg, {"params": params}, batch_size=8,
                               steps=2, sample_method="ddim",
                               text_buckets=(8,), refer_frames=8,
                               max_len=16, mesh=mesh, dtype=jnp.float32)
        rng = np.random.default_rng(0)
        monkeypatch.setattr(syn, "_prep_text", fake_prep_text)
        monkeypatch.setattr(
            syn, "_prep_refer",
            lambda p: rng.normal(size=(8, 8)).astype(np.float32))
        return syn

    rows = [{"utt_id": f"u{i}", "text": "x" * (4 + i), "lang": "EN",
             "refer": f"r{i % 2}"} for i in range(5)]

    n = jax.device_count()
    assert n == 8, "conftest must provide 8 virtual devices"
    mesh = Mesh(np.array(jax.devices()).reshape(n), ("data",))
    out_dp = make(mesh).synthesize_all(rows, seed=3)
    out_one = make(None).synthesize_all(rows, seed=3)

    assert [u for u, _ in out_dp] == [u for u, _ in out_one]
    for (_, a), (_, b_) in zip(out_dp, out_one):
        assert a.shape == b_.shape
        np.testing.assert_allclose(a, b_, rtol=1e-4, atol=1e-4)

    with pytest.raises(ValueError):
        BatchSynthesizer(cfg, {"params": params}, batch_size=3, mesh=mesh,
                         dtype=jnp.float32)


@pytest.mark.slow  # sampler + duration-pass compiles
def test_mel_length_buckets_and_vocoder(monkeypatch):
    """Long utterances land in a larger mel bucket instead of truncating at
    max_mel_len (VERDICT r3 missing #3; the reference generates unbounded
    ceil(sum w) frames, model3.py:842-847), and a configured vocoder yields
    per-utterance waveforms (model3.py:1195-1203)."""
    cfg = _tiny_cfg()
    model = DiffVits(cfg, n_vocab=len(symbols))
    b, t_x, t_y, s = 1, 8, 16, 8
    key = jax.random.PRNGKey(0)
    params = model.init(
        {"params": key, "dropout": key},
        jnp.zeros((b, t_x), jnp.int32), jnp.full((b,), t_x, jnp.int32),
        jnp.zeros((b, t_y, 8), jnp.float32), jnp.full((b,), t_y, jnp.int32),
        jnp.zeros((b, s, 8), jnp.float32), jnp.full((b,), s, jnp.int32),
        jnp.zeros((b, t_x), jnp.int32), jnp.zeros((b, t_x), jnp.int32),
        rng=key)["params"]

    from diff_vits_tpu.models.vocoder import Vocos
    voc = Vocos(n_mels=8, dim=16, intermediate_dim=32, num_layers=1,
                n_fft=64, hop_length=cfg.data.hop_length)
    vparams = voc.init(key, jnp.zeros((1, 8, 8), jnp.float32))["params"]

    # length_scale 30 makes every predicted duration blow past
    # max_mel_len=24, forcing the larger mel buckets
    syn = BatchSynthesizer(cfg, {"params": params}, batch_size=2, steps=2,
                           sample_method="ddim", text_buckets=(8,),
                           refer_frames=8, mel_buckets=(24, 48, 96),
                           length_scale=30.0, vocoder=(voc, vparams),
                           dtype=jnp.float32)
    assert set(syn._runs) == {24, 48, 96}

    def fake_prep_text(text, lang):
        n = len(text)
        ids = (np.arange(n) % 20 + 1).astype(np.int32)
        return ids, np.zeros(n, np.int32), np.zeros(n, np.int32)

    rng = np.random.default_rng(0)
    monkeypatch.setattr(syn, "_prep_text", fake_prep_text)
    monkeypatch.setattr(
        syn, "_prep_refer",
        lambda p: rng.normal(size=(8, 8)).astype(np.float32))

    rows = [{"utt_id": "long", "text": "x" * 7, "lang": "EN", "refer": "r"},
            {"utt_id": "also", "text": "x" * 6, "lang": "EN", "refer": "r"}]
    out = syn.synthesize_all(rows, seed=0)
    assert [r[0] for r in out] == ["long", "also"]
    hop = cfg.data.hop_length
    assert any(mel.shape[0] > cfg.data.max_mel_len for _, mel, _ in out)
    for _, mel, wav in out:
        assert mel.shape[0] <= 96 and np.isfinite(mel).all()
        assert wav.ndim == 1 and np.isfinite(wav).all()
        # batched decode is trimmed to the utterance's frames
        assert abs(wav.shape[0] - mel.shape[0] * hop) <= cfg.data.window_size
