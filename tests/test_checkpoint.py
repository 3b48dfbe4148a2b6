"""Checkpoint save/load + rotation + hparams utilities."""
import os

import numpy as np

from diff_vits_tpu.train import checkpoint as ck
from diff_vits_tpu.utils.hparams import HParams, load_params_tolerant, merge_params


def test_checkpoint_roundtrip_and_rotation(tmp_path):
    d = str(tmp_path)
    state = {"params": {"w": np.arange(6, dtype=np.float32).reshape(2, 3)},
             "opt_state": {"mu": np.zeros(3, np.float32)}}
    for step in (10, 20, 30, 40):
        ck.save_checkpoint(d, step, state, keep=2)
    files = sorted(os.listdir(d))
    assert files == ["model-30.ckpt", "model-40.ckpt"]
    assert ck.latest_checkpoint_path(d).endswith("model-40.ckpt")

    step, loaded = ck.load_checkpoint(ck.latest_checkpoint_path(d))
    assert step == 40
    np.testing.assert_array_equal(loaded["params"]["w"], state["params"]["w"])


def test_hparams():
    h = HParams(train={"lr": 1e-4, "betas": [0.9, 0.99]}, name="x")
    assert h.train.lr == 1e-4
    assert "name" in h
    assert h["name"] == "x"


def test_merge_and_tolerant_load():
    a = {"layer": {"w": np.ones((2, 2), np.float32)}}
    b = {"layer": {"w": np.zeros((2, 2), np.float32)}}
    merged = merge_params([a, b], [0.25, 0.75])
    np.testing.assert_allclose(merged["layer"]["w"], 0.25)

    target = {"layer": {"w": np.zeros((2, 2), np.float32),
                        "b": np.zeros(2, np.float32)}}
    saved = {"layer": {"w": np.ones((3, 3), np.float32)}}  # shape mismatch
    out = load_params_tolerant(target, saved)
    np.testing.assert_array_equal(out["layer"]["w"], target["layer"]["w"])
    assert "b" in out["layer"]


def test_sharded_state_save_load_bit_exact(tmp_path):
    """TP+FSDP-sharded train state saves and reloads bit-exactly on the
    8-device virtual mesh with state_sharding_rules active (VERDICT.md
    next-round #7)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import mesh_utils
    from jax.sharding import Mesh

    from diff_vits_tpu.parallel import mesh as mesh_lib

    mesh = Mesh(mesh_utils.create_device_mesh((2, 2, 2)),
                ("data", "seq", "model"))
    rng = np.random.default_rng(0)
    # paths chosen to trigger the TP column/row rules + FSDP scatter
    state = {
        "params": {
            "attn": {"to_q": {"kernel": rng.normal(size=(16, 8)).astype(
                np.float32)},
                     "to_out": {"kernel": rng.normal(size=(8, 16)).astype(
                         np.float32)}},
            "ffn_1": {"kernel": rng.normal(size=(16, 32)).astype(
                np.float32)},
            "norm": {"scale": np.ones(16, np.float32)},
        },
        "opt_state": {"mu": {"ffn_1": {"kernel": np.zeros(
            (16, 32), np.float32)}}},
        "step": jnp.asarray(7, jnp.int32),
    }
    sh = mesh_lib.state_sharding_rules(mesh, state, min_size=0,
                                       fsdp_axis="seq")
    sharded = jax.device_put(state, sh)
    # at least one leaf must actually be sharded for this to test anything
    specs = [x.sharding.spec for x in jax.tree_util.tree_leaves(sharded)
             if hasattr(x, "sharding") and hasattr(x.sharding, "spec")]
    assert any(any(p is not None for p in s) for s in specs), specs

    gathered = ck.gather_for_save(sharded)
    path = ck.save_checkpoint(str(tmp_path), 7, gathered, keep=1)
    step, loaded = ck.load_checkpoint(path)
    assert step == 7

    # reload under the same shardings and compare bit-exactly
    from flax import serialization
    restored = serialization.from_state_dict(state, loaded)
    resharded = jax.device_put(restored, sh)
    flat_a = jax.tree_util.tree_leaves(jax.device_get(sharded))
    flat_b = jax.tree_util.tree_leaves(jax.device_get(resharded))
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
