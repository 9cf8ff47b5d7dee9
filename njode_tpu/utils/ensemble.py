"""Vmapped multi-seed ensemble training — a TPU-native capability.

The reference trains one model per invocation; studying seed variance (as
the NJ-ODE paper does for its error bars) means launching K sequential jobs
(reference run_array_job.sh pattern).  On TPU the natural formulation is a
SINGLE program that trains all K ensemble members at once:

* ``jax.vmap`` over a leading seed axis of (params, opt_state, rng) turns
  the per-member epoch update into one batched program — the K members'
  matmuls fuse into larger MXU-shaped ops (hidden and batch axes unchanged,
  K folds into the batch dimension of every dot), so K models cost far less
  than K sequential runs.
* The seed axis is embarrassingly parallel: ``shard_ensemble`` places it on
  a mesh axis and each device (group) trains its members with ZERO
  cross-member collectives — perfect-scaling model parallelism that the
  per-member DP ``psum`` composes with.
* Per-member data streams are independent by default (fresh paths per seed
  per epoch, generated on device inside the same program), matching what K
  independent jobs would see; ``share_data=True`` trains all members on the
  identical stream to isolate init-seed variance.

The per-member update is literally ``Trainer._epoch_update`` (same minibatch
scan, same loss), so member ``s`` of an ensemble reproduces member ``s`` of
any other ensemble size bit-for-bit (``test_ensemble.py``).

``ensemble_predict`` + ``ensemble_mean_std`` give the payoff: epistemic
(seed) uncertainty bands around the conditional-moment predictions, for the
cost of one forward.

``train_ensemble_full`` makes ensembles first-class experiments: per-member
validation and relative losses recorded inside the same fused program,
chunked execution with a checkpoint hook, and exact resume (the epoch/data
key sequence continues where the previous run stopped).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import optax
from jax import lax
from jax.sharding import PartitionSpec as P

from ..models.jump_ode import NeuralJumpODE
from .training import Trainer, make_adam


def _member_keys(base: jax.Array, n_seeds: int,
                 share_data: bool = False) -> jax.Array:
    """Per-member keys: member s's key depends only on (base, s), never on
    n_seeds — so the same member is identical across ensemble sizes.
    ``share_data=True`` gives every member the SAME key (shared stream).
    The ONE derivation for training, validation, and rel-loss eval keys —
    eval data must mirror the member streams exactly."""
    if share_data:
        return jnp.broadcast_to(base, (n_seeds, *base.shape))
    return jax.vmap(lambda s: jax.random.fold_in(base, s))(
        jnp.arange(n_seeds))


def init_ensemble(model: NeuralJumpODE, n_seeds: int, seed: int = 0):
    """Stacked params for K independently-initialised members: every leaf
    gains a leading (K,) axis."""
    keys = _member_keys(jax.random.PRNGKey(seed), n_seeds)
    return jax.vmap(model.init)(keys)


def shard_ensemble(mesh, tree, axis: str = "model"):
    """Place the leading seed axis of every leaf on a mesh axis.

    Members are independent, so this is pure model parallelism: no
    collectives cross the seed axis.  Leaves whose leading dim doesn't
    divide the axis are replicated (keeps odd K working).
    """
    from ..parallel.mesh import _global_put

    n = mesh.shape[axis]

    def place(x):
        if x.ndim >= 1 and x.shape[0] % n == 0 and x.shape[0] > 1:
            return _global_put(x, mesh, P(axis, *([None] * (x.ndim - 1))))
        return _global_put(x, mesh, P())

    return jax.tree_util.tree_map(place, tree)


def train_ensemble_full(model: NeuralJumpODE, process_type: str, n_seeds: int,
                        n_epochs: int, n_trajectories: int = 1000,
                        batch_size: Optional[int] = 128,
                        obs_fraction: float = 0.1,
                        optimizer: Optional[optax.GradientTransformation] = None,
                        seed: int = 0, data_seed: int = 0,
                        shuffle: bool = True, share_data: bool = False,
                        mesh=None, obs_only: bool = False,
                        ignore_first_continuity: bool = True,
                        moment_weights=None, variance_method: str = "direct",
                        extended_moments: bool = False,
                        n_val: int = 0, rel_eval: Optional[dict] = None,
                        start_epoch: int = 0, initial_state=None,
                        chunk_len: Optional[int] = None, on_chunk=None,
                        member_hparams: Optional[dict] = None,
                        **process_kwargs):
    """Train K ensemble members with first-class evaluation and resume.

    The epoch update is identical to :func:`train_ensemble` (member ``s``
    stays bit-for-bit the same across ensemble sizes and regardless of the
    evaluation extras); on top of it:

    * ``n_val > 0``: a FIXED per-member validation batch is drawn once
      (member-independent streams, shared when ``share_data``) and every
      epoch records each member's validation loss — the single-model
      ``Trainer.validate`` semantics, vmapped.
    * ``rel_eval``: dict with ``times/values/mask`` (K, n_eval, ...) and
      precomputed per-member true-predictor losses ``l_true`` (K,); each
      epoch records the relative loss ``(L_model - L_true)/max(L_true,
      1e-8)`` per member (reference utils/training.py:219-255 semantics).
    * ``start_epoch``/``initial_state``: resume — continue the epoch/data
      key sequence exactly where a previous run stopped.
    * ``chunk_len``/``on_chunk``: the run executes as fused multi-epoch
      chunks; after each chunk ``on_chunk(next_epoch, params, opt_state,
      hist_so_far)`` runs on host (checkpointing hook).

    Returns ``(params_stack, opt_state_stack, hist)`` where ``hist`` maps
    ``train`` / ``val`` / ``rel`` to (n_epochs - start_epoch, K) arrays
    (``val``/``rel`` only when requested).

    ``mesh`` (optional): shard the seed axis over the mesh's 'model' axis
    (see :func:`shard_ensemble`); per-member batches stay unsharded — the
    seed axis IS the parallelism.

    ``member_hparams`` (optional): dict of (K,) arrays of PER-MEMBER
    optimizer hyperparameters (e.g. ``{"learning_rate": ..,
    "weight_decay": ..}``) — population training: the K members differ in
    hyperparameters, not just seed, and still train in the one vmapped
    program.  Requires an ``optax.inject_hyperparams`` optimizer (see
    :func:`population_adam`); the values override both a fresh init and a
    resumed state (the caller's request is authoritative).
    """
    from ..simulation import simulate_batch

    if model.use_pallas == "auto":
        # vmap-of-pallas_call runs members SEQUENTIALLY (batch grid axis)
        # while XLA folds them into the matmul batch axis — measured 0.82x
        # at K=8 (BENCH_NOTES.md r3c).  'auto' means measured-best, so the
        # ensemble program drops the kernels (a private copy; the caller's
        # model keeps its policy for single-model use).
        import copy as _copy
        model = _copy.copy(model)
        model.use_pallas = False

    tx = optimizer if optimizer is not None else make_adam(1e-3, 5e-4)
    # a Trainer only for its traced _epoch_update/_loss (one pytree of
    # config); its own params/opt_state are unused.
    trainer = Trainer(model, optimizer=tx,
                      ignore_first_continuity=ignore_first_continuity,
                      moment_weights=moment_weights,
                      variance_method=variance_method,
                      extended_moments=extended_moments)

    if initial_state is not None:
        params, opt_state = initial_state
    else:
        params = init_ensemble(model, n_seeds, seed=seed)
        opt_state = jax.vmap(tx.init)(params)
    if member_hparams:
        hp = getattr(opt_state, "hyperparams", None)
        if hp is None:
            raise ValueError(
                "member_hparams requires an optax.inject_hyperparams "
                "optimizer whose state carries the hyperparameters — use "
                "population_adam()")
        upd = {k: jnp.asarray(v, jnp.float32)
               for k, v in member_hparams.items()}
        unknown = sorted(set(upd) - set(hp))
        if unknown:
            raise ValueError(f"member_hparams keys {unknown} not in the "
                             f"optimizer's hyperparams {sorted(hp)}")
        bad = {k: v.shape for k, v in upd.items() if v.shape != (n_seeds,)}
        if bad:
            raise ValueError(f"member_hparams must be (n_seeds,) = "
                             f"({n_seeds},) arrays; got {bad}")
        opt_state = opt_state._replace(hyperparams={**hp, **upd})
    if mesh is not None:
        params = shard_ensemble(mesh, params)
        opt_state = shard_ensemble(mesh, opt_state)

    data_base = jax.random.PRNGKey(data_seed)
    step_base = jax.random.fold_in(jax.random.PRNGKey(seed), 0x5eed)
    seeds = jnp.arange(n_seeds)

    def member_data_key(epoch, s):
        k = jax.random.fold_in(data_base, epoch)
        return k if share_data else jax.random.fold_in(k, s)

    def gen(key, n):
        b = simulate_batch(key, n, process_type, obs_fraction,
                           obs_only=obs_only, **process_kwargs)
        return b.times, b.values, b.mask

    def member_update(p, s_state, times, values, mask, key):
        return trainer._epoch_update(p, s_state, times, values, mask, key,
                                     n_trajectories, batch_size, shuffle)

    val_data = None
    if n_val > 0:
        # validation tag = 2^32 - 1: training data keys are
        # fold_in(data_base, epoch) with epoch a small nonnegative int, so
        # the max-uint32 tag can never collide with an epoch's stream (a
        # small constant tag like 0x7a1 WOULD collide — with epoch 1953's
        # training data — making long runs validate on trained-on paths)
        vbase = jax.random.fold_in(data_base, 0xFFFFFFFF)
        vkeys = _member_keys(vbase, n_seeds, share_data)
        val_data = jax.jit(jax.vmap(lambda k: gen(k, n_val)))(vkeys)
        if mesh is not None:
            val_data = shard_ensemble(mesh, val_data)
    if mesh is not None and rel_eval is not None:
        # member-axis eval data follows its member's shard (and becomes a
        # global array, required when the mesh spans processes)
        rel_eval = shard_ensemble(mesh, rel_eval)

    # val_data/rel_eval enter as ARGUMENTS (global arrays may not be closed
    # over when the mesh spans processes)
    @partial(jax.jit, static_argnames=("n",))
    def run_chunk(p, s_state, e0, n, vdat, rel):
        def epoch_body(carry, e):
            p, s_state = carry
            dkeys = jax.vmap(lambda s: member_data_key(e, s))(seeds)
            times, values, mask = jax.vmap(lambda k: gen(k, n_trajectories))(
                dkeys)                                       # (K, n, N, ...)
            ukeys = jax.vmap(
                lambda s: jax.random.fold_in(jax.random.fold_in(step_base, e),
                                             s))(seeds)
            p, s_state, loss = jax.vmap(member_update)(p, s_state, times,
                                                       values, mask, ukeys)
            out = {"train": loss}                            # (K,)
            if vdat is not None:
                out["val"] = jax.vmap(trainer._loss)(p, *vdat)
            if rel is not None:
                l_model = jax.vmap(trainer._loss_no_first)(
                    p, rel["times"], rel["values"], rel["mask"])
                out["rel"] = ((l_model - rel["l_true"])
                              / jnp.maximum(rel["l_true"], 1e-8))
            return (p, s_state), out

        (p, s_state), hist = lax.scan(epoch_body, (p, s_state),
                                      e0 + jnp.arange(n))
        return p, s_state, hist

    def host_value(x):
        """Per-epoch loss rows come back sharded over the seed axis; gather
        them to every host for the history lists."""
        if isinstance(x, jax.Array) and not x.is_fully_addressable:
            from jax.experimental import multihost_utils
            return jnp.asarray(multihost_utils.process_allgather(x,
                                                                 tiled=True))
        return jnp.asarray(x)

    if not chunk_len:
        chunk_len = max(n_epochs - start_epoch, 1)
    hists = []
    e = start_epoch
    while e < n_epochs:
        n = min(chunk_len, n_epochs - e)
        params, opt_state, h = run_chunk(params, opt_state, e, n,
                                         val_data, rel_eval)
        hists.append(jax.tree_util.tree_map(host_value, h))
        e += n
        if on_chunk is not None:
            merged = jax.tree_util.tree_map(
                lambda *xs: jnp.concatenate(xs, axis=0), *hists)
            on_chunk(e, params, opt_state, merged)
    hist = jax.tree_util.tree_map(
        lambda *xs: jnp.concatenate(xs, axis=0), *hists) if hists else {
        "train": jnp.zeros((0, n_seeds))}
    return params, opt_state, hist


def population_adam(learning_rate: float = 1e-3,
                    weight_decay: float = 0.0):
    """:func:`make_adam` with lr/weight_decay carried in the OPTIMIZER
    STATE (``optax.inject_hyperparams``) instead of baked into the chain,
    so a vmapped ensemble can give every member its own values (the
    ``member_hparams`` hook of :func:`train_ensemble_full`).  With scalar
    state values the update is numerically identical to
    ``make_adam(learning_rate, weight_decay)`` — ``add_decayed_weights(0)``
    is exactly the no-decay chain."""
    def factory(learning_rate, weight_decay=0.0):
        return optax.chain(optax.add_decayed_weights(weight_decay),
                           optax.scale_by_adam(),
                           optax.scale(-learning_rate))
    return optax.inject_hyperparams(factory)(
        learning_rate=learning_rate, weight_decay=weight_decay)


def train_population(model: NeuralJumpODE, process_type: str,
                     learning_rates, n_epochs: int, *,
                     weight_decays=None, share_data: bool = True,
                     **kwargs):
    """Hyperparameter-population training: K models differing in optimizer
    hyperparameters train in ONE vmapped whole-run program.

    The reference explores hyperparameters with sequential jobs (its SLURM
    array sweeps architecture only and re-runs the trainer per config); on
    TPU a learning-rate/weight-decay grid costs one ensemble run — the K
    members' matmuls fuse exactly like a seed ensemble's, and the
    hyperparameters enter as (K,) state arrays (``population_adam``), not
    as K compiled programs.

    ``learning_rates``: (K,) array/list — defines the member count.
    ``weight_decays``: scalar or (K,) (default 0.0).
    ``share_data=True`` (default): all members see the SAME data stream,
    isolating the hyperparameter effect (members still differ in init
    seed; pass ``seed`` to move the whole population).

    Returns ``(params_stack, opt_state_stack, hist)`` exactly like
    :func:`train_ensemble_full` — per-member train (and optional val/rel)
    loss matrices, so the best member is ``argmin`` over the last row.
    """
    lr = jnp.asarray(learning_rates, jnp.float32)
    if lr.ndim != 1:
        raise ValueError("learning_rates must be one-dimensional")
    wd = (jnp.zeros_like(lr) if weight_decays is None
          else jnp.broadcast_to(
              jnp.asarray(weight_decays, jnp.float32), lr.shape))
    return train_ensemble_full(
        model, process_type, n_seeds=int(lr.shape[0]), n_epochs=n_epochs,
        optimizer=population_adam(), share_data=share_data,
        member_hparams={"learning_rate": lr, "weight_decay": wd},
        **kwargs)


def train_ensemble(model: NeuralJumpODE, process_type: str, n_seeds: int,
                   n_epochs: int, **kwargs):
    """Train K ensemble members in ONE jitted whole-run program.

    Thin wrapper over :func:`train_ensemble_full` without the evaluation /
    resume extras.  Returns ``(params_stack, losses)`` where every params
    leaf has a leading (K,) axis and ``losses`` is (n_epochs, K) per-member
    mean epoch loss.
    """
    params, _, hist = train_ensemble_full(model, process_type, n_seeds,
                                          n_epochs, **kwargs)
    return params, hist["train"]


def ensemble_predict(model: NeuralJumpODE, params_stack, times, values,
                     mask=None):
    """Forward every member on the same batch.

    Returns ``(preds, preds_before)`` shaped (K, B, N, d_y, M).
    """
    return jax.vmap(model.apply, in_axes=(0, None, None, None))(
        params_stack, times, values, mask)


def ensemble_mean_std(preds: jnp.ndarray):
    """Epistemic (seed) uncertainty: mean and std over the member axis."""
    return jnp.mean(preds, axis=0), jnp.std(preds, axis=0)
