"""Vmapped ensemble training (utils/ensemble.py).

The reference's only multi-seed story is K sequential jobs; here K members
train in one jitted program.  Pins: member identity across ensemble sizes,
training effectiveness, seed-axis sharding parity, and the uncertainty API.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.parallel import make_mesh
from njode_tpu.utils import (ensemble_mean_std, ensemble_predict,
                             init_ensemble, train_ensemble)
from njode_tpu.simulation import simulate_batch

MODEL_KW = dict(input_dim=1, hidden_dim=8, output_dim=1, num_moments=2,
                n_hidden_layers=1)
TRAIN_KW = dict(n_trajectories=32, batch_size=16, obs_fraction=0.2,
                n_steps=20, T=1.0, mu=0.1, sigma=0.5, x0=1.0)


def test_members_are_distinct_and_train():
    model = NeuralJumpODE(**MODEL_KW)
    params, losses = train_ensemble(model, "black_scholes", n_seeds=3,
                                    n_epochs=12, **TRAIN_KW)
    assert losses.shape == (12, 3)
    assert np.all(np.isfinite(losses))
    # every member improves over its first epoch
    assert np.all(np.asarray(losses[-1]) < np.asarray(losses[0]))
    # distinct seeds -> distinct members (params and losses)
    leaf = jax.tree_util.tree_leaves(params)[0]
    assert leaf.shape[0] == 3
    assert not np.allclose(np.asarray(leaf[0]), np.asarray(leaf[1]))
    assert not np.allclose(np.asarray(losses[:, 0]), np.asarray(losses[:, 1]))


def test_member_identity_across_ensemble_sizes():
    """Member s depends only on (seed, s): K=1 run == member 0 of K=3 run."""
    model = NeuralJumpODE(**MODEL_KW)
    p1, l1 = train_ensemble(model, "black_scholes", n_seeds=1, n_epochs=4,
                            **TRAIN_KW)
    p3, l3 = train_ensemble(model, "black_scholes", n_seeds=3, n_epochs=4,
                            **TRAIN_KW)
    np.testing.assert_allclose(np.asarray(l1[:, 0]), np.asarray(l3[:, 0]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p3)):
        np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]),
                                   rtol=1e-5, atol=1e-7)


def test_share_data_isolates_init_variance():
    """share_data=True: members see the same stream but stay distinct."""
    model = NeuralJumpODE(**MODEL_KW)
    _, losses = train_ensemble(model, "black_scholes", n_seeds=2, n_epochs=3,
                               share_data=True, **TRAIN_KW)
    assert np.all(np.isfinite(losses))
    assert not np.allclose(np.asarray(losses[:, 0]), np.asarray(losses[:, 1]))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_ensemble_matches_unsharded():
    """Seed axis on the mesh 'model' axis: same numbers, zero-collective EP."""
    model = NeuralJumpODE(**MODEL_KW)
    ref_p, ref_l = train_ensemble(model, "black_scholes", n_seeds=4,
                                  n_epochs=3, **TRAIN_KW)
    mesh = make_mesh(data=2, model=4)
    sh_p, sh_l = train_ensemble(model, "black_scholes", n_seeds=4,
                                n_epochs=3, mesh=mesh, **TRAIN_KW)
    np.testing.assert_allclose(np.asarray(ref_l), np.asarray(sh_l),
                               rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(ref_p),
                    jax.tree_util.tree_leaves(sh_p)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-6)


def test_ensemble_checkpoint_roundtrip(tmp_path):
    """Stacked ensemble params survive the standard checkpoint path (the
    leading seed axis is just another pytree-leaf dimension)."""
    from njode_tpu.utils.checkpoint import load_params, save_checkpoint

    model = NeuralJumpODE(**MODEL_KW)
    params = init_ensemble(model, 3, seed=0)
    path = tmp_path / "ensemble.ckpt"
    save_checkpoint(str(path), params, opt_state={},
                    histories={"train_loss": []})
    restored = load_params(str(path), params)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_ensemble_figure1_plot(tmp_path):
    """Figure-1 plot with epistemic seed bands from a stacked ensemble."""
    pytest.importorskip("matplotlib")
    from njode_tpu.utils.plotting import plot_single_trajectory_with_condexp

    model = NeuralJumpODE(**MODEL_KW)
    stack = init_ensemble(model, 3, seed=0)
    out = tmp_path / "fig1_ensemble.png"
    plot_single_trajectory_with_condexp(
        model, None, "black_scholes",
        dict(mu=0.1, sigma=0.5, T=1.0, n_steps=20, x0=1.0),
        obs_fraction=0.2, save_path=str(out), ensemble_params=stack)
    assert out.exists() and out.stat().st_size > 0


def test_ensemble_predict_and_uncertainty():
    model = NeuralJumpODE(**MODEL_KW)
    params = init_ensemble(model, 4, seed=0)
    batch = simulate_batch(jax.random.PRNGKey(1), 8, "black_scholes", 0.2,
                           n_steps=20, T=1.0, mu=0.1, sigma=0.5, x0=1.0)
    preds, preds_before = ensemble_predict(model, params, batch.times,
                                           batch.values, batch.mask)
    B, N = batch.times.shape
    assert preds.shape == (4, B, N, 1, 2)
    assert preds_before.shape == (4, B, N, 1, 2)
    mean, std = ensemble_mean_std(preds)
    assert mean.shape == (B, N, 1, 2)
    assert np.all(np.asarray(std) >= 0)
    assert np.any(np.asarray(std) > 0)        # members genuinely disagree
    assert np.all(np.isfinite(np.asarray(mean)))
