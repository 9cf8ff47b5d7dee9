"""Worker process for the 2-real-process multi-host integration test.

Launched by tests/test_multihost.py as ``python multihost_worker.py
<process_id> <num_processes> <port> <workdir>``.  Phase A runs one
data-parallel training step over the global mesh and prints the loss
bit-exactly (float hex); Phase B drives ``run_experiment`` with
``multihost=True`` + the Orbax checkpoint backend, then proves the
cross-process checkpoint restores by re-invoking run_experiment and taking
the already-completed early return.

The single-process side of the parity check imports :func:`phase_a_step`
from this module (importing must not initialize anything).
"""

import sys


def setup(process_id: int, num_processes: int, port: int):
    import jax
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    # bit-exact parity with the single-process run (tests/conftest.py)
    jax.config.update("jax_default_matmul_precision", "highest")
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=num_processes,
                               process_id=process_id)
    assert jax.process_count() == num_processes
    return jax


def phase_a_step():
    """One DP training step on the global mesh; returns the loss scalar.

    Every quantity is derived deterministically from fixed PRNG keys, so the
    result must be identical no matter how the 8 devices are spread over
    processes.
    """
    import jax
    import optax

    from njode_tpu import NeuralJumpODE
    from njode_tpu.models import nj_ode_loss_dense
    from njode_tpu.parallel import (global_mesh, make_batch_sharder,
                                    shard_params)
    from njode_tpu.simulation import simulate_batch
    from njode_tpu.utils.training import make_adam

    model = NeuralJumpODE(input_dim=1, hidden_dim=16, output_dim=1,
                          num_moments=2, n_hidden_layers=1,
                          shared_network=False, t_max=1.0)
    params = model.init(jax.random.PRNGKey(0))
    mesh = global_mesh()
    params = shard_params(mesh, params)
    tx = make_adam(1e-3, 5e-4)
    opt_state = shard_params(mesh, tx.init(params))

    batch = simulate_batch(jax.random.PRNGKey(1), 16, "black_scholes",
                           obs_fraction=0.2, mu=0.1, sigma=0.5,
                           T=1.0, n_steps=20, x0=1.0)
    times, values, mask = make_batch_sharder(mesh)(
        batch.times, batch.values, batch.mask)

    @jax.jit
    def train_step(params, opt_state, times, values, mask):
        def loss_fn(p):
            preds, before = model.apply(p, times, values, mask)
            return nj_ode_loss_dense(values, preds, before, mask,
                                     ignore_first_continuity=True,
                                     moment_weights=[1.0, 10.0])
        loss, g = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(g, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    _, _, loss = train_step(params, opt_state, times, values, mask)

    # forward-pass fingerprint: predictions involve NO collectives, so their
    # bytes must be identical regardless of how devices map to processes
    import hashlib

    import numpy as np
    from jax.experimental import multihost_utils

    preds, before = jax.jit(model.apply)(params, times, values, mask)
    gathered = [np.asarray(multihost_utils.process_allgather(x, tiled=True))
                for x in (preds, before)]
    digest = hashlib.sha256(b"".join(g.tobytes() for g in gathered))
    return float(loss), digest.hexdigest()


def phase_b_run_experiment(workdir: str):
    """Tiny multihost run_experiment with Orbax checkpointing + resume."""
    from njode_tpu.utils import run_experiment

    config = {
        "experiment_name": "mh_bs",
        "input_dim": 1, "hidden_dim": 16, "output_dim": 1,
        "n_hidden_layers": 1, "activation": "relu",
        "num_moments": 2, "moment_weights": [1.0, 10.0],
        "ignore_first_continuity": True,
        "learning_rate": 1e-3, "weight_decay": 5e-4,
        "n_epochs": 4, "batch_size": None, "print_every": 2,
        "multihost": True,  # initialize_distributed is idempotent
        "checkpoint_backend": "orbax",
        "data": {
            "process_type": "black_scholes",
            "n_train": 32, "n_val": 16, "obs_fraction": 0.2,
            "cache_data": False, "T": 1.0, "n_steps": 20,
            "mu": 0.1, "sigma": 0.5, "x0": 1.0,
        },
    }
    results = run_experiment(config, save_dir=workdir)
    final = results["final_train_loss"]

    # resume: the orbax checkpoint written collectively by both processes
    # must restore and early-return as already-completed
    results2 = run_experiment(config, save_dir=workdir)
    assert results2["history"].get("resumed_from_checkpoint"), \
        "expected early return from the restored checkpoint"
    assert abs(results2["history"]["train_loss"][-1] - final) < 1e-12
    return final


EP_CONFIG = {
    "experiment_name": "mh_ep",
    "input_dim": 1, "hidden_dim": 16, "output_dim": 1,
    "n_hidden_layers": 1, "activation": "relu",
    "num_moments": 2, "moment_weights": [1.0, 10.0],
    "ignore_first_continuity": True,
    "learning_rate": 1e-3, "weight_decay": 5e-4,
    "n_epochs": 2, "batch_size": None, "print_every": 2,
    "model_parallel": 2, "model_parallel_mode": "moments",
    "checkpoint_backend": "orbax",
    "data": {
        "process_type": "black_scholes",
        "n_train": 32, "n_val": 16, "obs_fraction": 0.2,
        "cache_data": False, "T": 1.0, "n_steps": 20,
        "mu": 0.1, "sigma": 0.5, "x0": 1.0,
    },
}

ENS_CONFIG = {
    "experiment_name": "mh_ens",
    "input_dim": 1, "hidden_dim": 8, "output_dim": 1,
    "n_hidden_layers": 1, "activation": "relu",
    "num_moments": 2, "moment_weights": [1.0, 10.0],
    "ignore_first_continuity": True,
    "learning_rate": 1e-2, "weight_decay": 5e-4,
    "n_epochs": 2, "batch_size": 16, "print_every": 2,
    "ensemble": 8,
    "data": {
        "process_type": "black_scholes",
        "n_train": 16, "n_val": 8, "obs_fraction": 0.2,
        "cache_data": False, "obs_only": True, "T": 1.0, "n_steps": 20,
        "mu": 0.1, "sigma": 0.5, "x0": 1.0,
    },
}


def phase_c_model_axis(workdir: str):
    """run_experiment over a (data=4, model=2) mesh spanning both
    processes, the moment networks sharded over the model axis (EP)."""
    import copy

    from njode_tpu.utils import run_experiment

    config = copy.deepcopy(EP_CONFIG)
    config["multihost"] = True
    results = run_experiment(config, save_dir=workdir)
    return results["final_train_loss"]


def phase_d_sharded_ensemble(workdir: str):
    """run_experiment --ensemble 8 --multihost: the seed axis shards over
    all 8 devices (4 members per process), with per-member val/rel loss."""
    import copy

    from njode_tpu.utils import run_experiment

    config = copy.deepcopy(ENS_CONFIG)
    config["multihost"] = True
    results = run_experiment(config, save_dir=workdir)
    h = results["history"]
    assert len(h["val_loss"]) == 2 and len(h["relative_loss"]) == 1
    import numpy as np
    assert np.asarray(h["member_train_loss"]).shape == (2, 8)
    return results["final_train_loss"]


def main():
    process_id, num_processes, port, workdir = (
        int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]), sys.argv[4])
    setup(process_id, num_processes, port)

    step_loss, pred_hash = phase_a_step()
    print(f"STEP_LOSS {float(step_loss).hex()}", flush=True)
    print(f"PRED_HASH {pred_hash}", flush=True)

    final = phase_b_run_experiment(workdir)
    print(f"FINAL_LOSS {float(final).hex()}", flush=True)
    print("RESUME_OK", flush=True)

    ep_final = phase_c_model_axis(workdir)
    print(f"EP_LOSS {float(ep_final).hex()}", flush=True)

    ens_final = phase_d_sharded_ensemble(workdir)
    print(f"ENS_LOSS {float(ens_final).hex()}", flush=True)


if __name__ == "__main__":
    main()
