"""Multi-device tests on the virtual 8-CPU-device mesh (SURVEY.md §4 item d)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE, nj_ode_loss
from njode_tpu.parallel import make_batch_sharder, make_mesh, shard_params
from njode_tpu.simulation import simulate_batch
from njode_tpu.utils import Trainer, make_adam

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


def test_mesh_construction():
    mesh = make_mesh(data=4, model=2)
    assert mesh.shape == {"data": 4, "model": 2}
    mesh2 = make_mesh()  # all devices on data
    assert mesh2.shape["data"] == 8


def test_dp_matches_single_device():
    """Sharded training step must produce the same loss/params as unsharded."""
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=2)
    batch = simulate_batch(jax.random.PRNGKey(0), 16, "black_scholes", 0.1)

    t1 = Trainer(model, make_adam(1e-2), moment_weights=[1.0, 10.0], seed=0)
    t2 = Trainer(model, make_adam(1e-2), moment_weights=[1.0, 10.0], seed=0,
                 mesh=make_mesh(data=8, model=1))

    losses1 = [t1.train_epoch(batch.times, batch.values, batch_size=None,
                              shuffle=False) for _ in range(3)]
    losses2 = [t2.train_epoch(batch.times, batch.values, batch_size=None,
                              shuffle=False) for _ in range(3)]
    np.testing.assert_allclose(losses1, losses2, rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(t1.params),
                    jax.tree_util.tree_leaves(t2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-7)


def test_moment_axis_ep_sharding():
    """Separate-network params shard their stacked K axis over 'model'."""
    mesh = make_mesh(data=4, model=2)
    model = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                          num_moments=2)
    params = model.init(jax.random.PRNGKey(0))
    sharded = shard_params(mesh, params, moment_axis=True)
    w = sharded["jump"]["layers"][0]["w"]
    assert "model" in str(w.sharding.spec)

    # forward still correct under EP sharding
    batch = simulate_batch(jax.random.PRNGKey(1), 8, "black_scholes", 0.1)
    shard = make_batch_sharder(mesh)
    times, values, mask = shard(batch.times, batch.values, batch.mask)
    p1, _ = jax.jit(model.apply)(params, batch.times, batch.values, batch.mask)
    p2, _ = jax.jit(model.apply)(sharded, times, values, mask)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5,
                               atol=1e-6)


def test_dp_chunked_run_experiment(tmp_path):
    """run_experiment with data_parallel: chunked training under a mesh
    produces the same losses as the single-device run (same seeds)."""
    from njode_tpu.utils import run_experiment
    base = dict(
        experiment_name="dp_bs", input_dim=1, hidden_dim=8, output_dim=1,
        learning_rate=1e-2, weight_decay=0.0, n_epochs=4, batch_size=8,
        print_every=2, num_moments=2, moment_weights=[1.0, 10.0],
        ignore_first_continuity=True, seed=0, data_seed=0,
        data=dict(process_type="black_scholes", n_train=16, n_val=8,
                  obs_fraction=0.1, cache_data=False, mu=0.1, sigma=0.5,
                  T=1.0, n_steps=30, x0=1.0))
    r1 = run_experiment({**base}, save_dir=str(tmp_path / "a"))
    r2 = run_experiment({**base, "data_parallel": 8},
                        save_dir=str(tmp_path / "b"))
    np.testing.assert_allclose(r1["history"]["train_loss"],
                               r2["history"]["train_loss"], rtol=1e-5)


def test_uneven_batch_falls_back():
    mesh = make_mesh(data=8, model=1)
    shard = make_batch_sharder(mesh)
    x = jnp.ones((10, 3))  # 10 % 8 != 0
    y = shard(x)
    assert np.allclose(np.asarray(y), 1.0)


def test_hidden_axis_tp_sharding():
    """Tensor parallelism: MLP weights shard their hidden axis over 'model';
    forward AND gradients stay correct (XLA inserts the collectives)."""
    import optax
    from njode_tpu.models import nj_ode_loss_dense

    mesh = make_mesh(data=2, model=4)
    model = NeuralJumpODE(input_dim=1, hidden_dim=16, output_dim=1,
                          num_moments=2, shared_network=True)
    params = model.init(jax.random.PRNGKey(0))
    sharded = shard_params(mesh, params, hidden_axis=True)
    w = sharded["jump"]["layers"][0]["w"]
    assert "model" in str(w.sharding.spec)
    # output head (d_y * K = 2, not divisible by 4) stays replicated
    w_out = sharded["out"]["layers"][-1]["w"]
    assert "model" not in str(w_out.sharding.spec)

    batch = simulate_batch(jax.random.PRNGKey(1), 8, "black_scholes", 0.1,
                           n_steps=20)
    shard = make_batch_sharder(mesh)
    times, values, mask = shard(batch.times, batch.values, batch.mask)

    p1, _ = jax.jit(model.apply)(params, batch.times, batch.values, batch.mask)
    p2, _ = jax.jit(model.apply)(sharded, times, values, mask)
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-5,
                               atol=1e-6)

    def loss(p, t, v, m):
        preds, before = model.apply(p, t, v, m)
        return nj_ode_loss_dense(v, preds, before, m,
                                 moment_weights=(1.0, 10.0))

    g1 = jax.jit(jax.grad(loss))(params, batch.times, batch.values, batch.mask)
    g2 = jax.jit(jax.grad(loss))(sharded, times, values, mask)
    for a, b in zip(jax.tree_util.tree_leaves(g1),
                    jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-6)
