"""Sequence-parallel (GSPMD) activation sharding: numerics are identical.

The 'seq' mesh axis shards [B, T, C] activations inside the UNet
(parallel/activations.py); GSPMD inserts the halo exchanges / blockwise
attention. These tests check the sharded program computes the same values
as the unsharded one on the virtual 8-device CPU mesh, including with FSDP
riding the same axis (the usual FSDP+SP pairing).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax.experimental import mesh_utils

from diff_vits_tpu.parallel import activations
from diff_vits_tpu.parallel import mesh as mesh_lib

# heavyweight: large XLA compiles / torch goldens (smoke tier: -m 'not
# slow'); also in the 'golden' tier — ~5 min of sharded-step compiles
pytestmark = [pytest.mark.slow, pytest.mark.golden]


@pytest.fixture(scope="module")
def mesh_dsm():
    if jax.device_count() < 8:
        pytest.skip("needs 8 virtual devices")
    devices = mesh_utils.create_device_mesh((2, 2, 2))
    return Mesh(devices, ("data", "seq", "model"))


def _unet(c_in=16):
    from diff_vits_tpu.nn.unet1d import UNet1DConditionModel
    return UNet1DConditionModel(
        in_channels=c_in, out_channels=8, block_out_channels=(16, 16, 32, 32),
        layers_per_block=1, norm_num_groups=8, cross_attention_dim=16,
        attention_head_dim=2)


def test_unet_seq_sharded_matches_unsharded(mesh_dsm):
    rng = np.random.default_rng(0)
    b, t, s, c = 2, 48, 12, 16
    x = jnp.asarray(rng.normal(size=(b, t, c)), jnp.float32)
    ctx = jnp.asarray(rng.normal(size=(b, s, 16)), jnp.float32)
    smask = jnp.asarray(rng.integers(0, 2, (b, s)), jnp.int32).at[:, 0].set(1)
    t_step = jnp.asarray([3.0, 7.0])

    model = _unet()
    params = model.init(jax.random.PRNGKey(0), x, t_step, ctx, smask)

    y_ref = model.apply(params, x, t_step, ctx, smask)

    with activations.sequence_parallel(mesh_dsm):
        fn = jax.jit(lambda p, *a: model.apply(p, *a),
                     in_shardings=(NamedSharding(mesh_dsm, P()),
                                   NamedSharding(mesh_dsm, P("data")),
                                   NamedSharding(mesh_dsm, P()),
                                   NamedSharding(mesh_dsm, P("data")),
                                   NamedSharding(mesh_dsm, P("data"))))
        y_sp = fn(params, x, t_step, ctx, smask)
    np.testing.assert_allclose(np.asarray(y_sp), np.asarray(y_ref),
                               rtol=2e-4, atol=2e-5)


def test_train_step_seq_parallel_loss_matches(mesh_dsm):
    import __graft_entry__ as ge
    from diff_vits_tpu.models.diff_vits import DiffVits
    from diff_vits_tpu.text.symbols import symbols
    from diff_vits_tpu.train.trainer import make_optimizer, make_train_step

    cfg = ge._tiny_config()
    model = DiffVits(cfg, n_vocab=len(symbols))
    tx = make_optimizer(cfg)
    batch = ge._tiny_batch()
    key = jax.random.PRNGKey(0)
    init = jax.jit(lambda k: model.init(
        {"params": k, "dropout": k}, batch["text"], batch["text_lengths"],
        batch["spec"], batch["spec_lengths"], batch["refer"],
        batch["refer_lengths"], batch["tone"], batch["language"],
        rng=k)["params"])
    params = init(key)

    def fresh_state():
        return {"params": params, "opt_state": tx.init(params),
                "step": jnp.asarray(0, jnp.int32), "rng": key}

    # baseline: plain single-device step
    step_ref = jax.jit(make_train_step(model, tx, cfg))
    _, m_ref = step_ref(fresh_state(), batch)

    # DP x SP x TP with ZeRO-3 scattering over the seq axis
    state_sh = mesh_lib.state_sharding_rules(mesh_dsm, fresh_state(),
                                             min_size=0, fsdp_axis="seq")
    data_sh = NamedSharding(mesh_dsm, P("data"))
    with activations.sequence_parallel(mesh_dsm):
        step_sp = jax.jit(make_train_step(model, tx, cfg),
                          in_shardings=(state_sh,
                                        {k: data_sh for k in batch}))
        state = jax.device_put(fresh_state(), state_sh)
        dbatch = {k: jax.device_put(np.asarray(v), data_sh)
                  for k, v in batch.items()}
        _, m_sp = step_sp(state, dbatch)

    np.testing.assert_allclose(float(m_sp["loss/all"]),
                               float(m_ref["loss/all"]), rtol=1e-4)
