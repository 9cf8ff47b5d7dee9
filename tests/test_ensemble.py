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


ENS_CONFIG = dict(
    experiment_name="ens_exp", input_dim=1, hidden_dim=8, output_dim=1,
    n_hidden_layers=1, activation="relu", learning_rate=1e-2,
    weight_decay=5e-4, n_epochs=6, batch_size=16, shuffle=True,
    print_every=2, ignore_first_continuity=True, num_moments=2,
    moment_weights=[1.0, 10.0], ensemble=3, seed=0, data_seed=0,
    data=dict(process_type="black_scholes", n_train=32, n_val=16,
              obs_fraction=0.2, cache_data=False, obs_only=True,
              mu=0.1, sigma=0.5, T=1.0, n_steps=20, x0=1.0),
)


def test_ensemble_experiment_first_class(tmp_path):
    """--ensemble runs record val loss + relative loss per member and keep
    the single-model history schema (VERDICT r2 missing item 3)."""
    import copy
    import json
    from njode_tpu.utils.training import run_experiment

    res = run_experiment(copy.deepcopy(ENS_CONFIG), save_dir=str(tmp_path))
    h = res["history"]
    # single-model schema: mean-over-member series
    assert len(h["train_loss"]) == 6
    assert len(h["val_loss"]) == 6
    assert res["final_val_loss"] is not None
    assert len(h["epoch_times"]) == 6
    # relative loss at the print cadence (epochs 0, 2, 4)
    assert len(h["relative_loss"]) == 3
    assert all(np.isfinite(h["relative_loss"]))
    # member matrices
    assert np.asarray(h["member_train_loss"]).shape == (6, 3)
    assert np.asarray(h["member_val_loss"]).shape == (6, 3)
    assert np.asarray(h["member_relative_loss"]).shape == (6, 3)
    # mean series really are the member means
    np.testing.assert_allclose(
        h["val_loss"], np.asarray(h["member_val_loss"]).mean(axis=1),
        rtol=1e-6)
    on_disk = json.loads(
        (tmp_path / "ens_exp" / "history.json").read_text())
    assert on_disk["n_ensemble"] == 3
    assert len(on_disk["val_loss"]) == 6


def test_ensemble_experiment_resume(tmp_path, capsys):
    """Preempted ensemble runs resume from the checkpoint and reproduce the
    uninterrupted run's members exactly."""
    import copy
    from njode_tpu.utils.training import run_experiment

    full = run_experiment(copy.deepcopy(ENS_CONFIG),
                          save_dir=str(tmp_path / "full"))

    cfg = copy.deepcopy(ENS_CONFIG)
    cfg["n_epochs"] = 2                      # resumed run spans 2+ chunks
    run_experiment(cfg, save_dir=str(tmp_path / "split"))
    cfg2 = copy.deepcopy(ENS_CONFIG)         # back to 6 epochs
    capsys.readouterr()                      # drop the pre-resume output
    res = run_experiment(cfg2, save_dir=str(tmp_path / "split"))
    # only the FIRST progress line after the resume carries the marker
    # (the old cumulative-rows arithmetic tagged every chunk)
    assert capsys.readouterr().out.count("(resumed)") == 1
    h = res["history"]
    assert h.get("resumed_from_checkpoint") is True
    assert len(h["train_loss"]) == 6
    np.testing.assert_allclose(h["train_loss"],
                               full["history"]["train_loss"],
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(np.asarray(h["member_val_loss"]),
                               np.asarray(full["history"]["member_val_loss"]),
                               rtol=1e-5, atol=1e-7)
    for a, b in zip(jax.tree_util.tree_leaves(res["params_stack"]),
                    jax.tree_util.tree_leaves(full["params_stack"])):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-7)

    # already complete -> early return, histories intact
    res3 = run_experiment(copy.deepcopy(ENS_CONFIG),
                          save_dir=str(tmp_path / "split"))
    assert len(res3["history"]["train_loss"]) == 6


@pytest.mark.skipif(len(jax.devices()) < 4, reason="needs 4 virtual devices")
def test_ensemble_with_data_parallel_shards_or_raises(tmp_path):
    """--ensemble + --data-parallel shards the SEED axis over the devices;
    an indivisible member count raises instead of silently running on one
    device (VERDICT r2 weak item 1)."""
    import copy
    from njode_tpu.utils.training import run_experiment

    cfg = copy.deepcopy(ENS_CONFIG)
    cfg["ensemble"] = 4
    cfg["data_parallel"] = 4
    res = run_experiment(cfg, save_dir=str(tmp_path))
    leaf = jax.tree_util.tree_leaves(res["params_stack"])[0]
    # the stacked seed axis really lives on the mesh's model axis
    assert len(leaf.sharding.device_set) == 4
    assert len(res["history"]["train_loss"]) == 6

    bad = copy.deepcopy(ENS_CONFIG)
    bad["ensemble"] = 3
    bad["data_parallel"] = 4
    with pytest.raises(ValueError, match="seed axis"):
        run_experiment(bad, save_dir=str(tmp_path / "bad"))


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


def test_auto_kernels_disabled_inside_ensemble(monkeypatch):
    """A use_pallas='auto' model at fused-step-eligible scale must train an
    ensemble on the pure-XLA path: vmap-of-pallas runs members sequentially
    (measured 0.82x, BENCH_NOTES r3c), so 'auto' (= measured-best) drops
    the kernels inside the vmapped program.  With a faked TPU backend the
    fused-step kernel WOULD engage at these shapes (hidden 256, 8192 folded
    rows) and a real pallas_call would crash this CPU run — passing proves
    the ensemble trainer's guard.  The caller's model keeps its policy."""
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    model = NeuralJumpODE(input_dim=1, hidden_dim=256, output_dim=1,
                          num_moments=2, use_pallas="auto")
    assert model._use_fused_step(3, n_rows=8192) is True  # would engage
    _, losses = train_ensemble(model, "black_scholes", n_seeds=2,
                               n_epochs=1, n_trajectories=4096,
                               batch_size=4096, obs_fraction=0.1,
                               n_steps=20, T=1.0, mu=0.1, sigma=0.5, x0=1.0)
    assert np.all(np.isfinite(losses))
    assert model.use_pallas == "auto"                     # caller unchanged
