"""Training orchestration: Trainer, data loaders, run_experiment.

TPU-native re-design of the reference orchestration layer
(reference: utils/training.py).  Differences that matter:

* A whole epoch — shuffle, minibatch sweep, gradient steps — is ONE jitted
  program (``lax.scan`` over minibatches), instead of a Python loop issuing
  per-tensor H2D copies and per-minibatch graph rebuilds
  (reference :78-101).  The last partial minibatch is padded and masked so
  shapes stay static; per-minibatch loss is the mean over its *real*
  trajectories and the epoch loss the mean over minibatches, matching the
  reference's ``total_loss / n_batches`` reduction exactly.
* Data generation happens on device inside jit (``DataLoader`` wraps
  ``simulate_batch``); fresh-per-epoch mode folds the epoch index into the
  PRNG key, which FIXES the reference's seed=i quirk where ``cache_data=False``
  regenerated identical batches every epoch (reference
  simulation/data_generation.py:273-286, SURVEY.md §7 defect list).
* The optimizer is the exact optax equivalent of
  ``torch.optim.Adam(lr, weight_decay)``: L2 decay added to the *gradient
  before* the Adam moments (``add_decayed_weights`` upstream of
  ``scale_by_adam``) — NOT decoupled AdamW (reference :396).
* Relative-loss evaluation (the paper's headline metric,
  reference :219-255) runs fully on device: analytic conditional moments are
  closed-form vectorized expressions, no host round-trip.
* Checkpoint/auto-resume keeps the reference's artifact layout and
  semantics: restore histories, ``start_epoch = len(train_losses)``,
  early-return when already complete, degrade to fresh training on any load
  error (reference :146-174).
"""

from __future__ import annotations

import inspect
import json
import time
from pathlib import Path
from typing import Any, Callable, Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import lax

from ..models import NeuralJumpODE, nj_ode_loss_dense, pad_ragged
from ..simulation import TrajectoryBatch, simulate_batch
from ..simulation.moments import moments_at_obs_jit
from .checkpoint import checkpoint_exists, load_checkpoint, save_checkpoint

RELATIVE_LOSS_PROCESSES = ("black_scholes", "ornstein_uhlenbeck", "heston",
                           "hybrid_ou_bs")


def _flat_ravel_friendly(tree) -> bool:
    """True when every leaf ravels cheaply on TPU: 0/1-D, or trailing dim
    1 or >= 8.  A multi-dim leaf with 1 < shape[-1] < 8 (e.g. the d_y=2
    model's (K, d_y) bias or (K, H, d_y) readout weight) makes XLA compile
    the raveled-Adam scan body into a ~0.8 ms/step program (measured,
    BENCH_NOTES.md r5h) while the per-leaf chain stays free — the flat
    update delegates to the chain for such trees."""
    return all(
        leaf.ndim < 2 or leaf.shape[-1] == 1 or leaf.shape[-1] >= 8
        for leaf in jax.tree_util.tree_leaves(tree))


def make_adam(learning_rate: float, weight_decay: float = 0.0,
              flat: bool = True) -> optax.GradientTransformation:
    """torch.optim.Adam(lr, weight_decay) equivalent (L2-into-grad, then Adam).

    ``flat=True`` (default) computes the update math on ONE raveled vector
    instead of per-leaf tree maps: identical per-element arithmetic (the
    exact optax-chain formulas, so updates are bit-identical), but ~a
    handful of XLA fusions instead of ~3 per parameter leaf — the optimizer
    was a measured 0.060 ms of the 0.294 ms production training step
    (BENCH_NOTES.md r3i).  The optimizer STATE keeps the optax chain's
    structure (param-shaped mu/nu inside a ScaleByAdamState tuple entry),
    so checkpoints and the whole-run kernel's state conversion interop
    either way.  Set ``flat=False`` when params are sharded over a model
    axis: raveling would all-gather them every step.

    The flat path auto-delegates to the per-leaf chain (identical state,
    identical updates) when any leaf has a non-trivial trailing dim < 8:
    raveling such leaves inside a jitted train loop costs a measured
    0.81-0.83 ms/step (vs ~0 for the chain) on TPU v5e — the d_y=2 model
    pytree's (K, d_y) bias and (K, H, d_y) readout leaves both trigger it
    (BENCH_NOTES.md r5h, scripts/probe_flat_adam.py).
    """
    b1, b2, eps = 0.9, 0.999, 1e-8
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam())  # b1=0.9, b2=0.999, eps=1e-8, like torch
    parts.append(optax.scale(-learning_rate))
    chain = optax.chain(*parts)
    if not flat:
        tx = chain
    else:
        from jax.flatten_util import ravel_pytree
        adam_i = 1 if weight_decay else 0

        def update(grads, state, params=None):
            if weight_decay and params is None:
                raise ValueError("make_adam with weight_decay needs params")
            if not _flat_ravel_friendly(grads):
                return chain.update(grads, state, params)
            g, unravel = ravel_pytree(grads)
            adam = state[adam_i]
            mu, _ = ravel_pytree(adam.mu)
            nu, _ = ravel_pytree(adam.nu)
            if weight_decay:
                p, _ = ravel_pytree(params)
                g = g + weight_decay * p
            count = optax.safe_int32_increment(adam.count)
            mu = (1 - b1) * g + b1 * mu
            nu = (1 - b2) * (g * g) + b2 * nu
            mu_hat = mu / (1 - b1 ** count).astype(mu.dtype)
            nu_hat = nu / (1 - b2 ** count).astype(nu.dtype)
            upd = (mu_hat / (jnp.sqrt(nu_hat) + eps)) * jnp.asarray(
                -learning_rate, mu_hat.dtype)
            new_adam = optax.ScaleByAdamState(count=count, mu=unravel(mu),
                                              nu=unravel(nu))
            new_state = tuple(new_adam if i == adam_i else s
                              for i, s in enumerate(state))
            return unravel(upd), new_state

        tx = optax.GradientTransformation(chain.init, update)
    # tag the chain with its hyperparameters (function objects take
    # attributes; the namedtuple itself doesn't) so the whole-run kernel
    # can verify train_kernel_opts against the optimizer it replaces
    tx.update.njode_hparams = {"lr": float(learning_rate),
                               "weight_decay": float(weight_decay),
                               "betas": (0.9, 0.999), "adam_eps": 1e-8}
    return tx


# --------------------------------------------------------------------------
# data loaders
# --------------------------------------------------------------------------

class DataLoader:
    """On-device trajectory generator with optional caching.

    Callable like the reference's data closures (utils/training.py:329-344)
    but returns a dense :class:`TrajectoryBatch` and accepts an epoch index
    for genuinely-fresh paths per epoch.
    """

    def __init__(self, key: jax.Array, n_trajectories: int, process_type: str,
                 obs_fraction: float, cache: bool, process_kwargs: dict,
                 obs_only: bool = False):
        self.key = key
        self.n_trajectories = n_trajectories
        self.process_type = process_type
        self.obs_fraction = obs_fraction
        self.cache = cache
        self.process_kwargs = dict(process_kwargs)
        self.obs_only = obs_only
        self._gen = jax.jit(lambda k: simulate_batch(
            k, n_trajectories, process_type, obs_fraction,
            obs_only=obs_only, **self.process_kwargs))
        self._cached: Optional[TrajectoryBatch] = None

    def __call__(self, epoch: int = 0) -> TrajectoryBatch:
        if self.cache:
            if self._cached is None:
                self._cached = self._gen(self.key)
            return self._cached
        return self._gen(jax.random.fold_in(self.key, epoch))

    def traced_gen(self, epoch) -> TrajectoryBatch:
        """Generate inside an enclosing jit (epoch may be a tracer)."""
        return simulate_batch(jax.random.fold_in(self.key, epoch),
                              self.n_trajectories, self.process_type,
                              self.obs_fraction, obs_only=self.obs_only,
                              **self.process_kwargs)


def create_data_loaders(process_type: str = "black_scholes",
                        n_train: int = 100, n_val: int = 20,
                        obs_fraction: float = 0.1,
                        cache_data: bool = True,
                        base_seed: int = 0,
                        obs_only: bool = False,
                        **process_kwargs):
    """Training/validation generators (reference utils/training.py:311-346).

    The validation loader is always cached (the reference regenerates the
    identical batch each epoch when cache_data=False — pure waste).

    ``obs_only=True`` (BS/OU) samples values exactly at the observation
    times and skips the unobserved grid — same training-data law, ~n_grid /
    n_obs cheaper generation (see ``simulate_batch``)."""
    key = jax.random.PRNGKey(base_seed)
    k_train, k_val = jax.random.split(key)
    train_fn = DataLoader(k_train, n_train, process_type, obs_fraction,
                          cache_data, process_kwargs, obs_only=obs_only)
    val_fn = DataLoader(k_val, n_val, process_type, obs_fraction,
                        True, process_kwargs, obs_only=obs_only)
    return train_fn, val_fn


def _call_data_fn(fn: Callable, epoch: int):
    if isinstance(fn, DataLoader):
        return fn(epoch)
    try:
        sig = inspect.signature(fn)
        if len(sig.parameters) >= 1:
            return fn(epoch)
    except (TypeError, ValueError):
        pass
    return fn()


def as_dense(data) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray,
                            Optional[TrajectoryBatch]]:
    """Normalize TrajectoryBatch / (ragged lists) / dense tuple to arrays."""
    if isinstance(data, TrajectoryBatch):
        return data.times, data.values, data.mask, data
    if isinstance(data, tuple) and len(data) == 2:
        bt, bv = data
        if isinstance(bt, (list, tuple)):
            t, v, m = pad_ragged(bt, bv)
            return t, v, m, None
        t, v = bt, bv
        return t, v, jnp.ones(t.shape, bool), None
    raise TypeError(f"Unsupported data batch type: {type(data)}")


# --------------------------------------------------------------------------
# Trainer
# --------------------------------------------------------------------------

class Trainer:
    """Holds model/optimizer state and drives jitted training.

    Mirrors the reference Trainer surface (utils/training.py:15-308):
    ``train_epoch`` / ``validate`` / ``train`` / ``save_model`` / ``load_model``
    plus histories, checkpointing and relative-loss evaluation.
    """

    def __init__(self, model: NeuralJumpODE,
                 optimizer: Optional[optax.GradientTransformation] = None,
                 device: str = "auto",  # accepted for API parity; JAX places on mesh/backend
                 ignore_first_continuity: bool = False,
                 moment_weights: Optional[List[float]] = None,
                 variance_method: str = "direct",
                 extended_moments: bool = False,
                 mesh=None, seed: int = 0,
                 checkpoint_backend: str = "msgpack",
                 model_shard: str = "none",
                 use_train_kernel=False,
                 train_kernel_opts: Optional[Dict] = None):
        self.model = model
        self.optimizer = optimizer if optimizer is not None else make_adam(1e-3)
        self.device = device
        self.ignore_first_continuity = ignore_first_continuity
        self.moment_weights = list(moment_weights) if moment_weights else None
        self.variance_method = variance_method
        self.extended_moments = extended_moments
        self.checkpoint_backend = checkpoint_backend
        self.mesh = mesh
        # the whole-run training kernel (ops/train_kernel.py): every epoch's
        # minibatch loop runs as ONE Pallas program with params + Adam state
        # in VMEM.  False | True | "interpret" (CPU tests) | "auto" (engage
        # on real TPU when the config is eligible, silently stay on XLA
        # otherwise — resolved at train() time).  The optimizer passed above
        # MUST be an Adam chain matching train_kernel_opts — the kernel
        # implements exactly the make_adam chain, with required keys
        # 'lr'/'weight_decay' and optional 'betas'/'adam_eps' (torch
        # defaults (0.9, 0.999)/1e-8 when omitted).
        self.use_train_kernel = use_train_kernel
        self.train_kernel_opts = dict(train_kernel_opts or {})
        if model_shard not in ("none", "moments", "hidden"):
            raise ValueError(f"Unknown model_shard: {model_shard!r} "
                             "(one of 'none', 'moments', 'hidden')")
        self.model_shard = model_shard
        self._rng = jax.random.PRNGKey(seed)

        self.params = model.init(jax.random.fold_in(self._rng, 0))
        self.opt_state = self.optimizer.init(self.params)
        self._place_state()

        self.train_losses: List[float] = []
        self.val_losses: List[float] = []
        self.epoch_times: List[float] = []
        self.relative_losses: List[float] = []

        self._epoch_fns: Dict[Any, Callable] = {}
        self._eval_fn = None
        self._shard = None
        if mesh is not None:
            from ..parallel import make_batch_sharder
            self._shard = make_batch_sharder(mesh)

    def _place_state(self):
        """Place params/opt_state on the mesh (replicated by default).

        Required whenever the mesh spans multiple processes: every array a
        multi-controller jit touches must be a global ``jax.Array``, so
        freshly-initialised or checkpoint-loaded (host-local) state is
        re-globalized here.  Harmless on single-process meshes.
        """
        if self.mesh is None:
            return
        from ..parallel import shard_params
        kw = dict(moment_axis=self.model_shard == "moments",
                  hidden_axis=self.model_shard == "hidden")
        self.params = shard_params(self.mesh, self.params, **kw)
        self.opt_state = shard_params(self.mesh, self.opt_state, **kw)

    # ------------------------------------------------------------- loss fn

    def _loss(self, params, times, values, mask, traj_mask=None, rng=None,
              training=False):
        # model.apply_loss dispatches to the lane-space fused loss when the
        # fused-step kernel carries the forward (r5i: the (B, N, d, K)
        # cotangent-assembly glue it removes is 1.18-1.46x of the scaled
        # training step) and composes apply + nj_ode_loss_dense otherwise.
        return self.model.apply_loss(
            params, times, values, mask, rng=rng, training=training,
            ignore_first_continuity=self.ignore_first_continuity,
            moment_weights=self.moment_weights,
            variance_method=self.variance_method,
            traj_mask=traj_mask,
            extended_moments=self.extended_moments)

    # ----------------------------------------------------------- train step

    def _epoch_update(self, params, opt_state, times, values, mask, key,
                      n: int, batch_size: Optional[int], shuffle: bool):
        """Traced one-epoch update (shuffle + padded minibatch scan)."""
        tx = self.optimizer
        full_batch = batch_size is None or batch_size >= n
        k_perm, k_drop = jax.random.split(key)
        if full_batch:
            def loss_fn(p):
                return self._loss(p, times, values, mask,
                                  rng=k_drop, training=True)
            loss, g = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(g, opt_state, params)
            params2 = optax.apply_updates(params, updates)
            return params2, opt_state2, loss

        bs = batch_size
        nb = -(-n // bs)
        n_pad = nb * bs
        perm = (jax.random.permutation(k_perm, n) if shuffle
                else jnp.arange(n))
        idx = jnp.concatenate(
            [perm, jnp.zeros((n_pad - n,), perm.dtype)]).reshape(nb, bs)
        valid = (jnp.arange(n_pad) < n).reshape(nb, bs)

        def mb_step(carry, x):
            p, s = carry
            ids, vm, j = x

            def loss_fn(pp):
                return self._loss(pp, times[ids], values[ids], mask[ids],
                                  traj_mask=vm,
                                  rng=jax.random.fold_in(k_drop, j),
                                  training=True)

            loss, g = jax.value_and_grad(loss_fn)(p)
            updates, s2 = tx.update(g, s, p)
            p2 = optax.apply_updates(p, updates)
            return (p2, s2), loss

        (params2, opt_state2), losses = lax.scan(
            mb_step, (params, opt_state), (idx, valid, jnp.arange(nb)))
        return params2, opt_state2, jnp.mean(losses)

    def _build_epoch_fn(self, n: int, batch_size: Optional[int], shuffle: bool):
        """One whole epoch as a single jitted program."""
        def epoch_fn(params, opt_state, times, values, mask, key):
            return self._epoch_update(params, opt_state, times, values, mask,
                                      key, n, batch_size, shuffle)
        return jax.jit(epoch_fn, donate_argnums=(0, 1))

    def _train_kernel_check(self, batch_size: Optional[int]):
        """Fail fast (with every problem listed) when the whole-run kernel
        can't represent this training setup."""
        from ..ops.train_kernel import (MAX_BATCH_ROWS, batch_size_ok,
                                        train_kernel_available)
        m = self.model
        problems = []
        if not train_kernel_available(
                m.shared_network, m.input_dim, m.output_dim,
                m.n_hidden_layers, m._act_key, m.dropout_rate,
                m._scale_key, m.dt_ode_step, m.ode_solver):
            problems.append(
                "model config (needs separate networks, input/output dim 1, "
                "one hidden layer, no dropout, euler, no --dt-ode-step, an "
                "f(0)=0 activation/scaling)")
        if m.num_moments not in (1, 2):
            problems.append("num_moments must be 1 or 2 (the kernel's "
                            "closed-form loss covers mean and mean+variance)")
        if m.hidden_dim > 128:
            problems.append("hidden_dim must be <= 128 (larger models are "
                            "faster on --kernels step)")
        if m.compute_dtype is not None:
            problems.append("float32 only")
        if not self.ignore_first_continuity:
            problems.append("ignore_first_continuity must be enabled")
        if self.extended_moments:
            problems.append("extended_moments unsupported")
        if self.mesh is not None:
            problems.append("data/model-parallel meshes unsupported")
        if not batch_size_ok(batch_size):
            problems.append("batch_size must be a multiple of 8 and <= "
                            f"{MAX_BATCH_ROWS} (the minibatch is the "
                            "kernel's VMEM row tile)")
        problems += self._kernel_opts_problems()
        if problems:
            raise ValueError("--kernels train not applicable: "
                             + "; ".join(problems))

    def _kernel_opts_problems(self):
        """Shared train_kernel_opts/optimizer-hyperparameter verification
        for both whole-run kernel twins (ops/train_kernel.py and
        ops/walk_train.py)."""
        problems = []
        for k in ("lr", "weight_decay"):
            if k not in self.train_kernel_opts:
                problems.append(f"train_kernel_opts missing {k!r}")
        mxu = self.train_kernel_opts.get("mxu_dtype", "float32")
        if mxu not in ("float32", "bfloat16"):
            problems.append(f"train_kernel_opts['mxu_dtype']={mxu!r} must "
                            "be 'float32' or 'bfloat16'")
        # catch a kernel that would silently train with different lr/wd
        # than the optax state it round-trips through (resume on the XLA
        # path would then switch hyperparameters mid-run): a make_adam
        # chain tags its update fn; an inject_hyperparams optimizer
        # (population_adam) carries them in state. Opaque third-party
        # optimizers can't be introspected — the train_kernel_opts
        # docstring remains their contract.
        hp = getattr(self.optimizer.update, "njode_hparams", None)
        if hp is None:
            ih = getattr(self.opt_state, "hyperparams", None)
            if isinstance(ih, dict) and "learning_rate" in ih:
                try:
                    hp = {"lr": float(ih["learning_rate"]),
                          "weight_decay": float(ih.get("weight_decay", 0.0))}
                except (TypeError, ValueError):
                    hp = None               # per-member arrays (population)
        if hp is not None:
            for k in ("lr", "weight_decay", "adam_eps"):
                want, got = hp.get(k), self.train_kernel_opts.get(k)
                if want is not None and got is not None \
                        and float(got) != float(want):
                    problems.append(
                        f"train_kernel_opts[{k!r}]={got} != the "
                        f"optimizer's {k}={want}")
            want_b = hp.get("betas")
            got_b = self.train_kernel_opts.get("betas")
            if want_b is not None and got_b is not None \
                    and tuple(map(float, got_b)) != tuple(map(float, want_b)):
                problems.append(f"train_kernel_opts['betas']={got_b} != the "
                                f"optimizer's betas={want_b}")
        return problems

    def _walk_train_check(self, batch_size: Optional[int],
                          n_slots: Optional[int] = None):
        """Fail fast (every problem listed) when the whole-run WALK-train
        kernel — the production ``--dt-ode-step`` twin of the whole-run
        training kernel (ops/walk_train.py) — can't represent this setup."""
        from ..ops.walk_scan import n_halves
        from ..ops.walk_train import (_VMEM_ROWS_MAX, LANES,
                                      walk_train_available,
                                      walk_train_shapes_ok)
        m = self.model
        problems = []
        if not walk_train_available(
                m.shared_network, m.input_dim, m.output_dim,
                m.n_hidden_layers, m._act_key, m.dropout_rate,
                m._scale_key, m.dt_ode_step, m.ode_solver):
            problems.append(
                "model config (needs --shared-network, input/output dim 1, "
                "one hidden layer, no dropout, euler/heun/rk4, "
                "--dt-ode-step, an f(0)=0 activation/scaling)")
        if not m.grid_walk:
            problems.append(
                "grid_walk off — the kernel integrates on the fixed "
                "{g*dt_ode_step} grid, so --grid-walk must resolve on "
                "(grid-aligned observation times; 'auto' also needs TPU + "
                "a single device)")
        if m.num_moments not in (1, 2):
            problems.append("num_moments must be 1 or 2 (the kernel's "
                            "closed-form loss covers mean and mean+variance)")
        if m.compute_dtype is not None:
            problems.append("float32 only")
        if not self.ignore_first_continuity:
            problems.append("ignore_first_continuity must be enabled")
        if self.extended_moments:
            problems.append("extended_moments unsupported")
        if self.mesh is not None:
            problems.append("data/model-parallel meshes unsupported")
        M = int(round(m.t_max / m.dt_ode_step)) if m.dt_ode_step else 0
        if not walk_train_shapes_ok(m.hidden_dim, batch_size,
                                    n_slots if n_slots is not None else 1, M):
            nh = n_halves(m.hidden_dim)
            problems.append(
                f"shapes (needs hidden_dim + 3 <= {LANES // nh}, batch_size "
                f"a multiple of {8 * nh} and <= 256 with the residual ring "
                f"(chunked: ~2*sqrt(cells) + 2*n_slots + 2) x batch/{nh} "
                f"<= {_VMEM_ROWS_MAX} VMEM scratch rows, 2*n_slots + 1 <= "
                f"{LANES}; got hidden "
                f"{m.hidden_dim}, batch {batch_size}, {M} cells, "
                f"n_slots {n_slots})")
        problems += self._kernel_opts_problems()
        if problems:
            raise ValueError("--kernels train (walk twin) not applicable: "
                             + "; ".join(problems))

    def _auto_walk_train_ok(self, batch_size: Optional[int],
                            use_chunks: bool, loader) -> bool:
        """Quiet twin of :meth:`_walk_train_check` for ``--kernels auto``:
        engage the whole-run walk-train kernel only where it measured
        fastest (real TPU, the eligible production shared-network config —
        7.0x the composed walk-kernel step, BENCH_NOTES.md r4a) and degrade
        to the composed XLA+walk-kernel path everywhere else."""
        if not use_chunks or jax.default_backend() != "tpu":
            return False
        n_slots = self._loader_n_slots(loader)
        if n_slots is None:
            return False
        try:
            self._walk_train_check(batch_size, n_slots=n_slots)
        except ValueError:
            return False
        return True

    def _auto_train_kernel_ok(self, batch_size: Optional[int],
                              use_chunks: bool, loader) -> bool:
        """Quiet twin of :meth:`_train_kernel_check` for ``--kernels auto``:
        engage the whole-run kernel only where it measured fastest
        (BENCH_NOTES.md r3b: real TPU, eligible small-model config, obs
        slots that fit the lane packing) and degrade to XLA everywhere
        else without noise — auto never runs the (slow) interpreter."""
        if not use_chunks or jax.default_backend() != "tpu":
            return False
        try:
            self._train_kernel_check(batch_size)
        except ValueError:
            return False
        from ..ops.train_kernel import LANES
        try:
            shapes = jax.eval_shape(loader.traced_gen,
                                    jax.ShapeDtypeStruct((), jnp.int32))
            n_slots = shapes.times.shape[1]
        except Exception:
            return False
        return 2 * n_slots + 1 <= LANES

    def _loader_n_slots(self, loader) -> Optional[int]:
        """Observation-slot count of a DataLoader's batches, traced shape
        only (no data generated)."""
        if not isinstance(loader, DataLoader):
            return None
        try:
            shapes = jax.eval_shape(loader.traced_gen,
                                    jax.ShapeDtypeStruct((), jnp.int32))
            return int(shapes.times.shape[1])
        except Exception:
            return None

    def _print_kernel_report(self, loader, batch_size, use_chunks,
                             use_kernel, kernel_twin="run") -> None:
        """One line per train() call stating which Pallas kernel carries
        which piece of the run and, for each declined kernel, the first
        failing eligibility reason — no silent '--kernels auto'
        degradation (VERDICT r3 weak item 2)."""
        from ..ops.report import kernel_report
        n_slots = self._loader_n_slots(loader)
        n_rows = batch_size
        if n_rows is None and isinstance(loader, DataLoader):
            n_rows = loader.n_trajectories
        suffix = " (walk twin)" if kernel_twin == "walk" else ""
        if use_kernel:
            # (train() may still downgrade a forced off-TPU run to the
            # Pallas interpreter right after this print)
            tk = ("on" if jax.default_backend() == "tpu"
                  else "interpret") + suffix
        elif self.use_train_kernel == "auto":
            if not use_chunks:
                tk = "needs on-device DataLoaders"
            elif jax.default_backend() != "tpu":
                tk = "not on TPU"
            else:
                try:
                    if kernel_twin == "walk":
                        self._walk_train_check(batch_size, n_slots=n_slots)
                    else:
                        self._train_kernel_check(batch_size)
                    tk = "obs slots exceed the lane packing" \
                        if n_slots is not None else "slot count unknown"
                except ValueError as e:
                    # first problem from the fail-fast check
                    tk = str(e).split(": ", 1)[-1].split(";")[0]
        else:
            tk = "--kernels is not 'train' or 'auto'"
        print(kernel_report(self.model, n_rows=n_rows, n_slots=n_slots,
                            train_kernel=tk), flush=True)

    def _build_kernel_chunk_fn(self, loader: "DataLoader", rel,
                               batch_size: int, shuffle: bool,
                               L: int, print_every: int,
                               interpret: bool = False, twin: str = "run"):
        """The whole-run-kernel twin of :meth:`_build_chunk_fn`: same
        (params, opt_state) API and identical history semantics, but each
        epoch's minibatch loop executes as one Pallas program.  The optax
        state converts exactly at the chunk boundary (kernel_state_from /
        optax_state_into), so checkpoints remain interchangeable with the
        XLA trainer's.  The shuffle key stream matches _epoch_update's, so
        per-epoch losses reproduce the XLA path to float tolerance.

        ``twin='walk'`` routes through the production --dt-ode-step kernel
        (ops/walk_train.py: same whole-run structure, but each gap is
        walked over the fixed {g*dt_ode_step} grid in-kernel)."""
        from ..ops.train_kernel import pack_minibatches
        if twin == "walk":
            from ..ops.walk_train import (fused_walk_train_run,
                                          optax_state_into_walk,
                                          unpack_walk_params, walk_state_from)
            state_from, state_into = walk_state_from, optax_state_into_walk
        else:
            from ..ops.train_kernel import (fused_train_run,
                                            kernel_state_from,
                                            optax_state_into,
                                            train_state_params)
            state_from, state_into = kernel_state_from, optax_state_into
        n = loader.n_trajectories
        bs = batch_size
        nb = -(-n // bs)
        n_pad = nb * bs
        kd = dict(num_moments=self.model.num_moments,
                  hidden_dim=self.model.hidden_dim)
        lr = float(self.train_kernel_opts["lr"])
        wd = float(self.train_kernel_opts["weight_decay"])
        # non-default Adam betas/eps are NOT introspectable from optax state;
        # train_kernel_opts is the contract — pass them here or the kernel
        # runs the torch defaults (0.9, 0.999, 1e-8)
        betas = tuple(float(b) for b in
                      self.train_kernel_opts.get("betas", (0.9, 0.999)))
        adam_eps = float(self.train_kernel_opts.get("adam_eps", 1e-8))
        mxu = str(self.train_kernel_opts.get("mxu_dtype", "float32"))
        mw = tuple(self.moment_weights) if self.moment_weights else (1.0, 1.0)
        cached = None
        if loader.cache:
            b = loader(0)
            cached = (b.times, b.values)

        def chunk_fn(params, opt_state, key, epoch0, val_t, val_v, val_m):
            kst = state_from(params, opt_state, betas=betas, **kd)

            def body(kst, e):
                epoch = epoch0 + e
                if cached is not None:
                    times, values = cached
                else:
                    b = loader.traced_gen(epoch)
                    times, values = b.times, b.values
                k_perm, _ = jax.random.split(jax.random.fold_in(key, epoch))
                perm = (jax.random.permutation(k_perm, n) if shuffle
                        else jnp.arange(n))
                idx = jnp.concatenate(
                    [perm, jnp.zeros((n_pad - n,), perm.dtype)])
                data = pack_minibatches(times[idx], values[idx],
                                        jnp.arange(n_pad) < n, bs)
                if twin == "walk":
                    m = self.model
                    kst2, step_losses = fused_walk_train_run(
                        kst, data, n_slots=times.shape[1], batch_size=bs,
                        dt_ode_step=m.dt_ode_step,
                        max_substeps=int(round(m.t_max / m.dt_ode_step)),
                        lr=lr, weight_decay=wd, moment_weights=mw,
                        variance_method=self.variance_method,
                        interpret=interpret, betas=betas, adam_eps=adam_eps,
                        activation=m._act_key, mxu_dtype=mxu,
                        input_scaling=m._scale_key,
                        ode_solver=m.ode_solver, **kd)
                else:
                    kst2, step_losses = fused_train_run(
                        kst, data, n_slots=times.shape[1], batch_size=bs,
                        lr=lr, weight_decay=wd, moment_weights=mw,
                        variance_method=self.variance_method,
                        interpret=interpret,
                        num_moments=self.model.num_moments,
                        betas=betas, adam_eps=adam_eps, mxu_dtype=mxu,
                        activation=self.model._act_key,
                        input_scaling=self.model._scale_key)
                tr_loss = jnp.mean(step_losses)
                p = (unpack_walk_params(kst2[0], kst2[1], **kd)
                     if twin == "walk" else train_state_params(kst2, **kd))
                val_loss = (self._loss(p, val_t, val_v, val_m)
                            if val_t is not None else jnp.nan)
                if rel is not None:
                    def rel_val(_):
                        Lm = self._loss_no_first(p, rel["times"],
                                                 rel["values"], rel["mask"])
                        Lt = nj_ode_loss_dense(
                            rel["values"], rel["y_true"],
                            rel["y_true_before"], rel["mask"],
                            moment_weights=self.moment_weights,
                            variance_method=self.variance_method,
                            extended_moments=self.extended_moments)
                        return (Lm - Lt) / jnp.maximum(Lt, 1e-8)
                    r = lax.cond(epoch % print_every == 0, rel_val,
                                 lambda _: jnp.nan, operand=None)
                else:
                    r = jnp.nan
                return kst2, (tr_loss, val_loss, r)

            kst, (tr, vl, rl) = lax.scan(body, kst, jnp.arange(L))
            params, opt_state = state_into(kst, L * nb, opt_state, **kd)
            return params, opt_state, tr, vl, rl

        return jax.jit(chunk_fn, donate_argnums=(0, 1))

    def _build_chunk_fn(self, loader: "DataLoader",
                        rel, batch_size: Optional[int], shuffle: bool,
                        L: int, print_every: int):
        """L epochs fused into one jitted program.

        Per epoch: (optionally fresh) on-device data generation, the epoch
        update, a full-batch validation loss, and — at epochs where
        ``epoch % print_every == 0``, matching the reference cadence
        (utils/training.py:219) — the relative-loss pair.  One device
        dispatch per L epochs instead of 3-4 (matters on high-latency
        backends: each dispatch costs ~0.1s over the tunnel).
        """
        n = loader.n_trajectories
        cached = None
        if loader.cache:
            b = loader(0)
            cached = (b.times, b.values, b.mask)
            if self._shard is not None:
                cached = self._shard(*cached)

        def constrain(x):
            """Pin the generated batch's trajectory axis to the 'data' mesh
            axis so the whole chunk runs data-parallel (XLA partitions the
            epoch update and inserts the gradient psum)."""
            if self.mesh is None or x.shape[0] % self.mesh.shape["data"] != 0:
                return x
            from jax.sharding import NamedSharding, PartitionSpec as P
            spec = P("data", *([None] * (x.ndim - 1)))
            return jax.lax.with_sharding_constraint(
                x, NamedSharding(self.mesh, spec))

        def chunk_fn(params, opt_state, key, epoch0, val_t, val_v, val_m):
            def body(carry, e):
                p, s = carry
                epoch = epoch0 + e
                if cached is not None:
                    times, values, mask = cached
                else:
                    b = loader.traced_gen(epoch)
                    times, values, mask = b.times, b.values, b.mask
                times, values, mask = (constrain(times), constrain(values),
                                       constrain(mask))
                k = jax.random.fold_in(key, epoch)
                p, s, tr_loss = self._epoch_update(
                    p, s, times, values, mask, k, n, batch_size, shuffle)
                val_loss = (self._loss(p, val_t, val_v, val_m)
                            if val_t is not None else jnp.nan)
                if rel is not None:
                    def rel_val(_):
                        Lm = self._loss_no_first(p, rel["times"],
                                                 rel["values"], rel["mask"])
                        Lt = nj_ode_loss_dense(
                            rel["values"], rel["y_true"],
                            rel["y_true_before"], rel["mask"],
                            moment_weights=self.moment_weights,
                            variance_method=self.variance_method,
                            extended_moments=self.extended_moments)
                        return (Lm - Lt) / jnp.maximum(Lt, 1e-8)
                    r = lax.cond(epoch % print_every == 0, rel_val,
                                 lambda _: jnp.nan, operand=None)
                else:
                    r = jnp.nan
                return (p, s), (tr_loss, val_loss, r)

            (params, opt_state), (tr, vl, rl) = lax.scan(
                body, (params, opt_state), jnp.arange(L))
            return params, opt_state, tr, vl, rl

        return jax.jit(chunk_fn, donate_argnums=(0, 1))

    def _get_epoch_fn(self, n, batch_size, shuffle):
        key = (n, batch_size, shuffle)
        if key not in self._epoch_fns:
            self._epoch_fns[key] = self._build_epoch_fn(n, batch_size, shuffle)
        return self._epoch_fns[key]

    def train_epoch(self, batch_times, batch_values,
                    batch_size: Optional[int] = None, shuffle: bool = True,
                    mask=None) -> float:
        """Train one epoch (reference utils/training.py:33-103)."""
        if isinstance(batch_times, (list, tuple)):
            times, values, mask_, _ = as_dense((batch_times, batch_values))
        else:
            times, values = batch_times, batch_values
            mask_ = mask if mask is not None else jnp.ones(times.shape, bool)
        if self._shard is not None:
            times, values, mask_ = self._shard(times, values, mask_)
        self._rng, k = jax.random.split(self._rng)
        fn = self._get_epoch_fn(times.shape[0], batch_size, shuffle)
        self.params, self.opt_state, loss = fn(
            self.params, self.opt_state, times, values, mask_, k)
        return float(loss)

    # ------------------------------------------------------------ validate

    def validate(self, batch_times, batch_values, mask=None) -> float:
        """Full-batch eval loss (reference utils/training.py:105-124)."""
        if isinstance(batch_times, (list, tuple)):
            times, values, mask_, _ = as_dense((batch_times, batch_values))
        else:
            times, values = batch_times, batch_values
            mask_ = mask if mask is not None else jnp.ones(times.shape, bool)
        if self._eval_fn is None:
            self._eval_fn = jax.jit(
                lambda p, t, v, m: self._loss(p, t, v, m))
        if self._shard is not None:
            times, values, mask_ = self._shard(times, values, mask_)
        return float(self._eval_fn(self.params, times, values, mask_))

    # ----------------------------------------------------- relative loss

    def _setup_relative_loss(self, train_data_fn, config):
        """Fixed 10-trajectory eval batch + precomputed analytic truths
        (reference utils/training.py:184-196,219-255)."""
        data_cfg = config["data"]
        process_type = data_cfg["process_type"]
        from ..simulation.registry import get_moments_fn
        if (process_type not in RELATIVE_LOSS_PROCESSES
                and get_moments_fn(process_type) is None):
            return None
        batch = _call_data_fn(train_data_fn, 0)
        times, values, mask, tb = as_dense(batch)
        times, values, mask = times[:10], values[:10], mask[:10]
        process_params = {k: v for k, v in data_cfg.items()
                          if k != "process_type"}
        switch_times = None
        if (process_type == "hybrid_ou_bs"
                and data_cfg.get("switch_time") is None
                and tb is not None and tb.switch_times is not None
                and config.get("exact_hybrid_truths", False)):
            # improvement over the reference (which returns zero truths for
            # random switch times): use the recorded per-path switch times.
            switch_times = tb.switch_times[:10]
        y_true, y_true_before = moments_at_obs_jit(
            times, values, process_type,
            num_moments=self.model.num_moments,
            variance_method=self.variance_method,
            mask=mask, switch_times=switch_times, **process_params)
        rel_fn = jax.jit(lambda p, t, v, m, yt, ytb: (
            self._loss_no_first(p, t, v, m),
            nj_ode_loss_dense(v, yt, ytb, m,
                              moment_weights=self.moment_weights,
                              variance_method=self.variance_method,
                              extended_moments=self.extended_moments)))
        if self._shard is not None:  # globalize for multi-process meshes
            times, values, mask, y_true, y_true_before = self._shard(
                times, values, mask, y_true, y_true_before)
        return dict(times=times, values=values, mask=mask,
                    y_true=y_true, y_true_before=y_true_before, fn=rel_fn)

    def _loss_no_first(self, params, times, values, mask):
        # relative-loss eval uses default ignore_first_continuity=False,
        # matching the reference's eval-time nj_ode_loss calls (:225-227,:250)
        return self.model.apply_loss(
            params, times, values, mask,
            moment_weights=self.moment_weights,
            variance_method=self.variance_method,
            extended_moments=self.extended_moments)

    def compute_relative_loss(self, rel) -> float:
        L_model, L_true = rel["fn"](self.params, rel["times"], rel["values"],
                                    rel["mask"], rel["y_true"],
                                    rel["y_true_before"])
        L_model, L_true = float(L_model), float(L_true)
        return (L_model - L_true) / max(L_true, 1e-8)

    # ---------------------------------------------------------------- train

    def train(self, train_data_fn: Callable, val_data_fn: Optional[Callable] = None,
              n_epochs: int = 100, batch_size: Optional[int] = None,
              shuffle: bool = True, print_every: int = 10,
              save_path: Optional[str] = None,
              resume_from_checkpoint: bool = True,
              config: Optional[Dict] = None,
              chunk_epochs="auto") -> Dict:
        """Training driver (reference utils/training.py:126-287)."""
        start_epoch = 0
        if resume_from_checkpoint and checkpoint_exists(save_path):
            print(f"Found existing checkpoint at {save_path}")
            try:
                self.params, self.opt_state, hist = load_checkpoint(
                    save_path, self.params, self.opt_state)
                self._place_state()
                self.train_losses = hist["train_losses"]
                self.val_losses = hist["val_losses"]
                self.epoch_times = hist["epoch_times"]
                self.relative_losses = hist["relative_loss"]
                start_epoch = len(self.train_losses)
                print(f"Resuming from epoch {start_epoch} "
                      f"(previous best loss: {min(self.train_losses):.6f})")
                if start_epoch >= n_epochs:
                    print(f"Training already completed ({start_epoch} >= "
                          f"{n_epochs} epochs)")
                    return {
                        "train_loss": self.train_losses,
                        "val_loss": self.val_losses,
                        "epoch_times": self.epoch_times,
                        "relative_loss": self.relative_losses,
                        "resumed_from_checkpoint": True,
                    }
            except Exception as e:  # degrade to fresh training, like the reference
                print(f"Warning: Could not load checkpoint ({e}). "
                      f"Starting fresh training.")
                start_epoch = 0

        history = {
            "train_loss": self.train_losses.copy(),
            "val_loss": self.val_losses.copy(),
            "epoch_times": self.epoch_times.copy(),
            "relative_loss": self.relative_losses.copy(),
        }

        rel = None
        if config and "data" in config and "process_type" in config["data"]:
            try:
                rel = self._setup_relative_loss(train_data_fn, config)
            except Exception as e:
                print(f"Warning: relative-loss setup failed: {e}")
                rel = None

        # Fused multi-epoch path: when data comes from on-device loaders,
        # run whole print intervals as single jitted programs.
        use_chunks = (chunk_epochs not in (0, False, None)
                      and isinstance(train_data_fn, DataLoader)
                      and (val_data_fn is None
                           or isinstance(val_data_fn, DataLoader)))
        # resolve the kernel decision PER CALL (self.use_train_kernel stays
        # as configured, so 'auto' keeps its silent-XLA-fallback promise on
        # every train() invocation, not just the first).  Which whole-run
        # twin applies is the model's recipe: --dt-ode-step routes to the
        # walk-train kernel (ops/walk_train.py); single-Euler-step gaps to
        # the original whole-run kernel (ops/train_kernel.py).
        kernel_twin = "walk" if self.model.dt_ode_step is not None else "run"
        use_kernel = self.use_train_kernel
        if use_kernel == "auto":
            if kernel_twin == "walk":
                use_kernel = self._auto_walk_train_ok(
                    batch_size, use_chunks, train_data_fn)
                if use_kernel:
                    print("Whole-run walk-train kernel engaged (--kernels "
                          "auto: eligible production TPU config — "
                          "BENCH_NOTES.md r4a)")
            else:
                use_kernel = self._auto_train_kernel_ok(
                    batch_size, use_chunks, train_data_fn)
                if use_kernel:
                    print("Whole-run training kernel engaged (--kernels "
                          "auto: eligible small-model TPU config — "
                          "BENCH_NOTES.md r3b)")
        self._print_kernel_report(train_data_fn, batch_size, use_chunks,
                                  use_kernel, kernel_twin=kernel_twin)
        if use_kernel:
            if kernel_twin == "walk":
                self._walk_train_check(
                    batch_size, n_slots=self._loader_n_slots(train_data_fn))
            else:
                self._train_kernel_check(batch_size)
            if not use_chunks:
                raise ValueError("--kernels train requires on-device "
                                 "DataLoaders (the fused chunk path)")
            if use_kernel is True and jax.default_backend() != "tpu":
                # mirror --kernels step's off-TPU story, but the whole-run
                # kernel has no XLA twin to fall back to — run the Pallas
                # interpreter (correct, slow; fine for CLI smoke tests)
                print("Note: --kernels train off TPU; using the Pallas "
                      "interpreter")
                use_kernel = "interpret"
        if use_chunks:
            return self._train_chunked(
                train_data_fn, val_data_fn, start_epoch, n_epochs,
                batch_size, shuffle, print_every, save_path, rel, history,
                print_every if chunk_epochs == "auto" else int(chunk_epochs),
                use_kernel=use_kernel, kernel_twin=kernel_twin)

        val_batch = None
        for epoch in range(start_epoch, n_epochs):
            t0 = time.time()

            batch = _call_data_fn(train_data_fn, epoch)
            times, values, mask, _ = as_dense(batch)
            train_loss = self.train_epoch(times, values, batch_size=batch_size,
                                          shuffle=shuffle, mask=mask)
            self.train_losses.append(train_loss)
            history["train_loss"].append(train_loss)

            val_loss = None
            if val_data_fn is not None:
                if val_batch is None or not isinstance(val_data_fn, DataLoader) \
                        or not val_data_fn.cache:
                    val_batch = as_dense(_call_data_fn(val_data_fn, epoch))
                vt, vv, vm, _ = val_batch
                val_loss = self.validate(vt, vv, mask=vm)
                self.val_losses.append(val_loss)
                history["val_loss"].append(val_loss)

            if rel is not None and epoch % print_every == 0:
                try:
                    r = self.compute_relative_loss(rel)
                except Exception as e:
                    print(f"Warning: Could not compute relative loss at epoch "
                          f"{epoch}: {e}")
                    r = float("nan")
                history["relative_loss"].append(r)
                self.relative_losses.append(r)

            epoch_time = time.time() - t0
            history["epoch_times"].append(epoch_time)
            self.epoch_times.append(epoch_time)

            if epoch % print_every == 0 or epoch == start_epoch:
                msg = f"Epoch {epoch:4d} | Train Loss: {train_loss:.6f}"
                if val_loss is not None:
                    msg += f" | Val Loss: {val_loss:.6f}"
                if history["relative_loss"]:
                    msg += f" | Rel Loss: {history['relative_loss'][-1]:.4f}"
                msg += f" | Time: {epoch_time:.2f}s"
                if start_epoch > 0 and epoch == start_epoch:
                    msg += " (resumed)"
                print(msg, flush=True)
                if save_path is not None:
                    self.save_model(save_path)

        if save_path is not None:
            self.save_model(save_path)
        return history

    def _train_chunked(self, loader, val_loader, start_epoch, n_epochs,
                       batch_size, shuffle, print_every, save_path, rel,
                       history, chunk_len, use_kernel=False,
                       kernel_twin="run"):
        """Drive training in fused chunks (see _build_chunk_fn).

        ``use_kernel`` is the per-call resolution of ``use_train_kernel``
        (False | True | 'interpret') from :meth:`train`; ``kernel_twin``
        selects the whole-run kernel ('run' = ops/train_kernel.py, 'walk'
        = the production --dt-ode-step twin, ops/walk_train.py)."""
        if val_loader is not None:
            vb = val_loader(0)
            val_t, val_v, val_m = vb.times, vb.values, vb.mask
            if self._shard is not None:
                val_t, val_v, val_m = self._shard(val_t, val_v, val_m)
        else:
            val_t = val_v = val_m = None

        fns: Dict[int, Callable] = {}

        def get_fn(L):
            if L not in fns:
                if use_kernel:
                    fns[L] = self._build_kernel_chunk_fn(
                        loader, rel, batch_size, shuffle, L, print_every,
                        interpret=(use_kernel == "interpret"),
                        twin=kernel_twin)
                else:
                    fns[L] = self._build_chunk_fn(loader, rel, batch_size,
                                                  shuffle, L, print_every)
            return fns[L]

        self._rng, key = jax.random.split(self._rng)
        epoch = start_epoch
        while epoch < n_epochs:
            # align chunk ends to print boundaries so prints/saves keep the
            # reference cadence even after an unaligned resume
            to_boundary = print_every - (epoch % print_every)
            L = min(chunk_len, to_boundary, n_epochs - epoch)
            t0 = time.time()
            self.params, self.opt_state, tr, vl, rl = get_fn(L)(
                self.params, self.opt_state, key, epoch, val_t, val_v, val_m)
            tr = np.asarray(tr)
            vl = np.asarray(vl)
            rl = np.asarray(rl)
            chunk_time = time.time() - t0
            # failure detection: surface divergence immediately with the
            # exact epoch (the checkpoint from the previous print interval
            # remains usable for resume-with-lower-lr)
            if not np.all(np.isfinite(tr)):
                bad = int(np.argmax(~np.isfinite(tr)))
                print(f"Warning: non-finite training loss at epoch "
                      f"{epoch + bad} — try a lower learning rate or "
                      f"variance_method='second_moment'.", flush=True)
            per_epoch = chunk_time / L

            for i in range(L):
                self.train_losses.append(float(tr[i]))
                history["train_loss"].append(float(tr[i]))
                if val_loader is not None:
                    self.val_losses.append(float(vl[i]))
                    history["val_loss"].append(float(vl[i]))
                if rel is not None and (epoch + i) % print_every == 0:
                    self.relative_losses.append(float(rl[i]))
                    history["relative_loss"].append(float(rl[i]))
                history["epoch_times"].append(per_epoch)
                self.epoch_times.append(per_epoch)

            for i in range(L):
                e = epoch + i
                if e % print_every == 0 or e == start_epoch:
                    msg = f"Epoch {e:4d} | Train Loss: {float(tr[i]):.6f}"
                    if val_loader is not None:
                        msg += f" | Val Loss: {float(vl[i]):.6f}"
                    if history["relative_loss"]:
                        msg += (f" | Rel Loss: "
                                f"{history['relative_loss'][-1]:.4f}")
                    msg += f" | Time: {per_epoch:.2f}s"
                    if start_epoch > 0 and e == start_epoch:
                        msg += " (resumed)"
                    print(msg, flush=True)
            if save_path is not None:
                self.save_model(save_path)
            epoch += L

        if save_path is not None:
            self.save_model(save_path)
        return history

    # ------------------------------------------------------------- persist

    def _histories(self):
        return {
            "train_losses": self.train_losses,
            "val_losses": self.val_losses,
            "epoch_times": self.epoch_times,
            "relative_loss": self.relative_losses,
        }

    def save_model(self, path: str):
        save_checkpoint(path, self.params, self.opt_state, self._histories(),
                        backend=self.checkpoint_backend)

    def load_model(self, path: str):
        self.params, self.opt_state, hist = load_checkpoint(
            path, self.params, self.opt_state)
        self._place_state()
        self.train_losses = hist["train_losses"]
        self.val_losses = hist["val_losses"]
        self.epoch_times = hist["epoch_times"]
        self.relative_losses = hist["relative_loss"]


# --------------------------------------------------------------------------
# run_experiment
# --------------------------------------------------------------------------

def _resolve_grid_walk(config: Dict,
                       platform: Optional[str] = None,
                       single_device: bool = True,
                       use_pallas_cfg=None) -> bool:
    """Grid-walk policy.  'on' -> the time-major walk unconditionally
    ('off' -> per-gap loops).  'auto' engages exactly in the measured-win
    regime: the fused walk KERNEL must carry it (real TPU, kernel-eligible
    config, single device) — the pure-XLA walk measured neutral at batch
    256 and 0.67x at 2048 (BENCH_NOTES.md r3g: the select-heavy scan body
    lowers at 17-54 us/cell where a plain euler scan is 3 us), while the
    kernel measured a win (r3h).  Alignment (times are
    ``obs_idx * (T/n_steps)``, simulation/sde.py) is a hard precondition
    either way."""
    setting = config.get("grid_walk", "auto")
    dt = config.get("dt_ode_step")
    if dt is None or setting in (False, "off", None):
        return False
    if setting in (True, "on"):
        return True
    # ---- auto: only when a Pallas kernel will carry the walk — the fused
    # walk kernel ('auto'/forced) or the whole-run walk-train kernel
    # ('train' with --dt-ode-step routes there; it integrates the same
    # fixed grid in-kernel, so the alignment promise is identical) ----
    if platform != "tpu" or not single_device:
        return False
    if use_pallas_cfg not in ("auto", True, "train"):
        return False
    solver = config.get("ode_solver", "euler")
    if (config.get("compute_dtype") not in (None, "float32", "none")
            or int(config.get("ensemble", 0) or 0) > 1):
        return False
    if not _grid_walk_aligned(config):
        return False
    from ..models.activations import (canonical_activation,
                                      canonical_input_scaling)
    if solver != "euler":
        # only the whole-run walk-train kernel carries non-euler walks
        # (the fused walk kernel is euler-only, so apply/validation keeps
        # the per-gap XLA path under 'auto'); engage grid_walk exactly
        # when that kernel's static config gate passes (r5 — the Trainer
        # re-checks shapes at train() time)
        from ..ops.walk_train import walk_train_available
        return walk_train_available(
            bool(config.get("shared_network", False)),
            int(config.get("input_dim", 1)),
            int(config.get("output_dim", config.get("input_dim", 1))),
            int(config.get("n_hidden_layers", 1)),
            canonical_activation(config.get("activation", "relu")),
            float(config.get("dropout_rate", 0.0)),
            canonical_input_scaling(config.get("input_scaling", "identity")),
            dt, solver)
    from ..ops.walk_scan import walk_scan_available
    return walk_scan_available(
        int(config.get("n_hidden_layers", 1)),
        canonical_activation(config.get("activation", "relu")),
        float(config.get("dropout_rate", 0.0)),
        canonical_input_scaling(config.get("input_scaling", "identity")),
        int(config.get("input_dim", 1)), int(config["hidden_dim"]))


def _grid_walk_aligned(config: Dict) -> bool:
    """Does the data config GUARANTEE every observation time sits on the
    integration grid?  True iff the simulation grid spacing T/n_steps is
    an integer multiple of ``dt_ode_step``."""
    dt = config.get("dt_ode_step")
    if dt is None:
        return False
    data = config.get("data", {})
    spacing = float(data.get("T", 1.0)) / int(data.get("n_steps", 100))
    r = spacing / float(dt)
    return round(r) >= 1 and abs(r - round(r)) < 1e-9


def _use_grid_walk(config: Dict, platform: Optional[str] = None,
                   single_device: bool = True,
                   use_pallas_cfg=None) -> bool:
    """Resolve + statically validate the grid-walk request: inside the
    jitted training step the model's concrete-input alignment check can't
    see the data, so a misaligned ``--grid-walk on`` would silently
    mis-integrate — reject it here from the static config instead."""
    if not _resolve_grid_walk(config, platform, single_device,
                              use_pallas_cfg):
        return False
    if not _grid_walk_aligned(config):
        data = config.get("data", {})
        spacing = float(data.get("T", 1.0)) / int(data.get("n_steps", 100))
        raise ValueError(
            f"--grid-walk on: observation times are multiples of the "
            f"simulation grid spacing T/n_steps = {spacing:g}, which is not "
            f"an integer multiple of dt_ode_step = "
            f"{config.get('dt_ode_step')} — the walk would integrate on a "
            "grid the observations don't sit on. Choose dt_ode_step that "
            "divides the grid spacing, or drop --grid-walk.")
    return True


def run_experiment(config: Dict, save_dir: str = "runs") -> Dict:
    """Complete training experiment (reference utils/training.py:349-438).

    Artifact layout preserved: ``runs/<experiment_name>/{config.json,
    model.ckpt, history.json}``.
    """
    if (config.get("extended_moments", False)
            and config.get("data", {}).get("process_type") == "heston"):
        # fail fast with the same documented refusal moments_at_obs raises:
        # higher Heston conditional moments have no closed-form truths
        raise ValueError(
            "--extended-moments is unsupported for the heston process: "
            "higher conditional moments of the Heston price have no closed "
            "form (the BS approximation used for mean/variance does not "
            "extend).  Drop --extended-moments or use black_scholes / "
            "ornstein_uhlenbeck / hybrid_ou_bs.")

    multihost = bool(config.get("multihost", False))
    if multihost:
        # must happen before any backend/device query (SURVEY.md §2b row P3)
        from ..parallel import initialize_distributed
        initialize_distributed(
            coordinator_address=config.get("coordinator_address"),
            num_processes=config.get("num_processes"),
            process_id=config.get("process_id"))
    try:
        is_primary = jax.process_index() == 0
    except RuntimeError:  # backend not initializable yet; ensure_backend below
        is_primary = True

    save_path = Path(save_dir) / config["experiment_name"]
    save_path.mkdir(parents=True, exist_ok=True)
    if is_primary:
        with open(save_path / "config.json", "w") as f:
            json.dump(config, f, indent=2)

    from .backend import ensure_backend
    devices = ensure_backend()
    platform = devices[0].platform
    print(f"Backend: {platform} | devices: {len(devices)} | "
          f"process {jax.process_index()}/{jax.process_count()}")

    mesh = None
    n_dp = config.get("data_parallel", 0)
    n_ensemble = int(config.get("ensemble", 0) or 0)
    lrs_cfg = config.get("ensemble_lrs") or None
    if lrs_cfg and n_ensemble <= 1:
        # config-dict callers (the CLI resolves this in _parse_ensemble_lrs):
        # a population request implies its member count — never silently
        # train one model at config['learning_rate']
        n_ensemble = len(lrs_cfg)
        config = {**config, "ensemble": n_ensemble}
    if n_ensemble > 1:
        # ensembles parallelize over the SEED axis (zero cross-member
        # collectives), so a device request via --data-parallel/--multihost
        # becomes a model-axis mesh the member stack shards over;
        # indivisible member counts are an error, never a silent
        # single-device run (VERDICT r2 weak item 1)
        if multihost or (n_dp and n_dp > 1):
            from ..parallel import make_mesh
            n_dev = len(jax.devices()) if multihost else int(n_dp)
            if n_ensemble % n_dev != 0:
                raise ValueError(
                    f"--ensemble {n_ensemble} cannot shard over {n_dev} "
                    f"devices: the member count must be a multiple of the "
                    f"device count (ensemble runs parallelize over the seed "
                    f"axis). Use --ensemble {n_dev * max(1, n_ensemble // n_dev)} "
                    f"or adjust --data-parallel.")
            mesh = make_mesh(data=1, model=n_dev)
    elif multihost:
        from ..parallel import global_mesh
        mesh = global_mesh(model=int(config.get("model_parallel", 1) or 1))
    elif (n_dp and n_dp > 1) or int(config.get("model_parallel", 1) or 1) > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(data=(n_dp if n_dp and n_dp > 1 else None),
                         model=int(config.get("model_parallel", 1) or 1))

    # --kernels train is a TRAINER strategy (the whole-run Pallas program),
    # not a model forward mode — the model itself stays on the XLA path for
    # eval/plots while the Trainer routes epochs through ops/train_kernel.py
    use_pallas_cfg = config.get("use_pallas", False)
    use_train_kernel = use_pallas_cfg == "train"
    if use_pallas_cfg == "auto" and n_ensemble <= 1:
        # --kernels auto also engages the whole-run TRAINING kernel where it
        # measured fastest (small-model TPU configs, BENCH_NOTES.md r3b) —
        # the Trainer resolves eligibility at train() time, where the mesh,
        # batch size, and obs-slot count are all known.  The model keeps
        # use_pallas='auto' for its own (inference-side) gap-kernel policy.
        use_train_kernel = "auto"
    if use_train_kernel is True:
        use_pallas_cfg = False
        if n_ensemble > 1:
            # measured: the XLA vmapped ensemble beats the vmapped kernel
            # (members fold into the matmul batch axis — BENCH_NOTES r3c)
            raise ValueError(
                "--kernels train is a single-model strategy; ensembles run "
                "the (measured-faster) XLA vmapped path — drop one flag")

    model = NeuralJumpODE(
        input_dim=config["input_dim"],
        hidden_dim=config["hidden_dim"],
        output_dim=config["output_dim"],
        dt_between_obs=config.get("dt_between_obs"),
        dt_ode_step=config.get("dt_ode_step"),
        num_moments=config.get("num_moments", 1),
        n_hidden_layers=config.get("n_hidden_layers", 1),
        activation=config.get("activation", "relu"),
        shared_network=config.get("shared_network", False),
        dropout_rate=config.get("dropout_rate", 0.0),
        input_scaling=config.get("input_scaling", "identity"),
        # the reference omits this forward (utils/training.py:381-393, a
        # known trap per SURVEY.md §7); we pass it through.
        variance_method=config.get("variance_method", "direct"),
        t_max=config.get("data", {}).get("T", 1.0),
        compute_dtype=config.get("compute_dtype"),
        ode_solver=config.get("ode_solver", "euler"),
        use_pallas=use_pallas_cfg,
        debug_checks=config.get("debug_checks", False),
        # grid-walk resolution sees the ORIGINAL --kernels value: 'train'
        # with --dt-ode-step routes to the walk-train kernel, which needs
        # the same grid-alignment promise the walk kernel does (the local
        # use_pallas_cfg was zeroed above so the model's eval path stays
        # on XLA)
        grid_walk=_use_grid_walk(
            config, platform,
            single_device=(mesh is None and n_ensemble <= 1),
            use_pallas_cfg=config.get("use_pallas", False)),
    )

    if n_ensemble > 1:
        return _run_ensemble_experiment(config, model, save_path, n_ensemble,
                                        is_primary, mesh=mesh)

    # flat (raveled) Adam math everywhere EXCEPT under model parallelism,
    # where params are sharded over the model axis and raveling them would
    # all-gather every step
    optimizer = make_adam(config["learning_rate"], config["weight_decay"],
                          flat=int(config.get("model_parallel", 1) or 1) <= 1)
    trainer = Trainer(model, optimizer,
                      device=config.get("device", "auto"),
                      ignore_first_continuity=config.get("ignore_first_continuity", False),
                      moment_weights=config.get("moment_weights"),
                      variance_method=config.get("variance_method", "direct"),
                      extended_moments=config.get("extended_moments", False),
                      mesh=mesh,
                      seed=config.get("seed", 0),
                      checkpoint_backend=config.get("checkpoint_backend",
                                                    "msgpack"),
                      model_shard=(config.get("model_parallel_mode")
                                   or ("moments"
                                       if int(config.get("model_parallel", 1)
                                              or 1) > 1 else "none")),
                      use_train_kernel=use_train_kernel,
                      train_kernel_opts=dict(
                          lr=config["learning_rate"],
                          weight_decay=config["weight_decay"],
                          mxu_dtype=config.get("train_kernel_mxu",
                                               "float32")))

    train_data_fn, val_data_fn = create_data_loaders(
        base_seed=config.get("data_seed", 0), **config["data"])

    print(f"Starting experiment: {config['experiment_name']}")
    print(f"Model parameters: {trainer.model.n_params(trainer.params):,}")

    history = trainer.train(
        train_data_fn=train_data_fn,
        val_data_fn=val_data_fn,
        n_epochs=config["n_epochs"],
        batch_size=config.get("batch_size"),
        shuffle=config.get("shuffle", True),
        print_every=config.get("print_every", 10),
        save_path=str(save_path / "model.ckpt"),
        resume_from_checkpoint=config.get("resume_from_checkpoint", True),
        config=config,
    )

    if is_primary:
        with open(save_path / "history.json", "w") as f:
            json.dump(history, f, indent=2)
    print(f"Experiment completed. Results saved to {save_path}")

    return {
        "config": config,
        "history": history,
        "save_path": str(save_path),
        "final_train_loss": history["train_loss"][-1],
        "final_val_loss": history["val_loss"][-1] if history["val_loss"] else None,
    }


def _ensemble_rel_eval(config: Dict, model, n_seeds: int,
                       share_data: bool = False) -> Optional[Dict]:
    """Per-member relative-loss eval data: a fixed 10-trajectory subset of
    each member's epoch-0 train stream plus the (constant) true-predictor
    loss, mirroring the single-model ``_setup_relative_loss``
    (reference utils/training.py:184-196,219-255).  ``share_data`` mirrors
    the training streams: every member evaluates on the SAME subset."""
    data = dict(config["data"])
    process_type = data["process_type"]
    from ..simulation.registry import get_moments_fn
    if (process_type not in RELATIVE_LOSS_PROCESSES
            and get_moments_fn(process_type) is None):
        return None

    proc_kwargs = {k: v for k, v in data.items()
                   if k not in ("process_type", "n_train", "n_val",
                                "obs_fraction", "cache_data", "obs_only")}
    data_base = jax.random.PRNGKey(config.get("data_seed", 0))
    from .ensemble import _member_keys
    k0 = jax.random.fold_in(data_base, 0)   # epoch-0 data key (ensemble.py)
    keys = _member_keys(k0, n_seeds, share_data)

    def gen10(k):
        b = simulate_batch(k, data["n_train"], process_type,
                           data.get("obs_fraction", 0.1),
                           obs_only=bool(data.get("obs_only", False)),
                           **proc_kwargs)
        sw = (b.switch_times[:10] if b.switch_times is not None
              else jnp.zeros((10,)))
        return b.times[:10], b.values[:10], b.mask[:10], sw

    times, values, mask, sw = jax.jit(jax.vmap(gen10))(keys)

    switch_times = None
    if (process_type == "hybrid_ou_bs" and data.get("switch_time") is None
            and config.get("exact_hybrid_truths", False)):
        switch_times = sw
    process_params = {k: v for k, v in data.items() if k != "process_type"}

    def truths(t, v, m, s):
        return moments_at_obs_jit(
            t, v, process_type, num_moments=model.num_moments,
            variance_method=config.get("variance_method", "direct"),
            mask=m, switch_times=s if switch_times is not None else None,
            **process_params)

    y_true, y_true_before = jax.vmap(truths)(times, values, mask, sw)
    l_true = jax.vmap(lambda v, yt, ytb, m: nj_ode_loss_dense(
        v, yt, ytb, m, moment_weights=config.get("moment_weights"),
        variance_method=config.get("variance_method", "direct"),
        extended_moments=config.get("extended_moments", False)))(
        values, y_true, y_true_before, mask)
    return dict(times=times, values=values, mask=mask, l_true=l_true)


def _population_winner(member_rows):
    """Best member by final val loss (train when no validation ran),
    NaN-safe: diverged members never win; all-NaN returns (None, None)."""
    rows = member_rows["val"] or member_rows["train"]
    if not rows:
        return None, None
    by = "val" if member_rows["val"] else "train"
    arr = np.asarray(rows[-1], dtype=float)
    if np.all(np.isnan(arr)):
        return None, by
    return int(np.nanargmin(arr)), by


def _print_population_winner(lrs, member_rows):
    best, by = _population_winner(member_rows)
    if best is None:
        print("Population winner: none (every member's final loss is NaN)")
        return
    loss = float((member_rows[by])[-1][best])
    print(f"Population winner: lr={float(lrs[best]):g} (member {best}, "
          f"final {by} loss {loss:.6f})")


def _run_ensemble_experiment(config: Dict, model, save_path, n_seeds: int,
                             is_primary: bool, mesh=None) -> Dict:
    """``run_experiment`` body for ``config['ensemble'] = K > 1``.

    A first-class experiment: K independently-seeded members train in ONE
    vmapped program (utils/ensemble.py) with the experiment's recipe,
    recording per-member train loss, validation loss (fixed per-member val
    batches) and relative loss every epoch; checkpoints save at every print
    interval and auto-resume exactly like single-model runs.  Artifacts:
    ``model.ckpt`` holds the STACKED params (leading seed axis) plus the
    member loss matrices; ``history.json`` keeps the single-model schema
    (mean-over-members series) plus ``member_train_loss`` /
    ``member_val_loss`` / ``member_relative_loss``.

    ``mesh`` (from ``--data-parallel``/``--multihost``): the seed axis
    shards over the mesh's 'model' axis — ensemble parallelism is over
    members, with zero cross-member collectives.
    """
    import time as _time

    from .ensemble import init_ensemble, train_ensemble_full

    data = dict(config["data"])
    n_epochs = config["n_epochs"]
    print_every = config.get("print_every", 10)
    backend = config.get("checkpoint_backend", "msgpack")
    ckpt_path = str(save_path / "model.ckpt")
    # --ensemble-lrs: population training — members differ in optimizer
    # hyperparameters, share the data stream (isolates the lr effect)
    lrs = config.get("ensemble_lrs") or None
    member_hparams = None
    if lrs is not None:
        from .ensemble import population_adam
        if len(lrs) != n_seeds:
            raise ValueError(f"ensemble_lrs has {len(lrs)} values for "
                             f"ensemble={n_seeds}")
        tx = population_adam()
        member_hparams = {
            "learning_rate": jnp.asarray(lrs, jnp.float32),
            "weight_decay": jnp.full((n_seeds,),
                                     float(config["weight_decay"]),
                                     jnp.float32)}
        print(f"Population training: member learning rates {lrs}")
    else:
        tx = make_adam(config["learning_rate"], config["weight_decay"])
    share_data = lrs is not None
    n_val = int(data.get("n_val", 0) or 0)

    rel_eval = None
    try:
        rel_eval = _ensemble_rel_eval(config, model, n_seeds,
                                      share_data=share_data)
    except Exception as e:
        print(f"Warning: relative-loss setup failed: {e}")

    # ---- resume (reference utils/training.py:146-174 semantics) ----
    member_rows = {"train": [], "val": [], "rel": []}
    epoch_walls: List[float] = []
    initial_state, start_epoch, resumed = None, 0, False
    if config.get("resume_from_checkpoint", True) and checkpoint_exists(ckpt_path):
        try:
            tpl_p = init_ensemble(model, n_seeds, seed=config.get("seed", 0))
            tpl_o = jax.vmap(tx.init)(tpl_p)
            p0, o0, hists = load_checkpoint(ckpt_path, tpl_p, tpl_o)
            member_rows["train"] = [list(map(float, r))
                                    for r in hists.get("member_train_loss", [])]
            member_rows["val"] = [list(map(float, r))
                                  for r in hists.get("member_val_loss", [])]
            member_rows["rel"] = [list(map(float, r))
                                  for r in hists.get("member_relative_loss", [])]
            epoch_walls = list(hists.get("epoch_times", []))
            start_epoch = len(member_rows["train"])
            initial_state, resumed = (p0, o0), True
            print(f"Resuming {n_seeds}-member ensemble from epoch {start_epoch}")
        except Exception as e:
            print(f"Warning: Could not load ensemble checkpoint ({e}). "
                  f"Starting fresh.")
            member_rows = {"train": [], "val": [], "rel": []}
            epoch_walls, initial_state, start_epoch = [], None, 0

    def assemble_history() -> Dict:
        tr = member_rows["train"]
        va = member_rows["val"]
        re = member_rows["rel"]
        history = {
            "train_loss": [float(np.mean(r)) for r in tr],
            "val_loss": [float(np.mean(r)) for r in va],
            # mean-over-members at the single-model print cadence
            "relative_loss": [float(np.mean(r)) for e, r in enumerate(re)
                              if e % print_every == 0],
            "epoch_times": list(epoch_walls),
            "member_train_loss": tr,
            "member_val_loss": va,
            "member_relative_loss": re,
            "n_ensemble": n_seeds,
        }
        if lrs is not None:
            history["ensemble_lrs"] = [float(x) for x in lrs]
            best, by = _population_winner(member_rows)
            if best is not None:
                history["best_member"] = best
                history["best_member_by"] = by
        if resumed:
            history["resumed_from_checkpoint"] = True
        return history

    def ckpt_histories() -> Dict:
        h = assemble_history()
        return {
            "train_losses": h["train_loss"],
            "val_losses": h["val_loss"],
            "epoch_times": h["epoch_times"],
            "relative_loss": h["relative_loss"],
            "member_train_loss": member_rows["train"],
            "member_val_loss": member_rows["val"],
            "member_relative_loss": member_rows["rel"],
        }

    if start_epoch >= n_epochs:
        print(f"Training already completed ({start_epoch} epochs)")
        if lrs is not None:
            _print_population_winner(lrs, member_rows)
        history = assemble_history()
        params_stack, _, _ = (initial_state[0], None, None) if initial_state \
            else (init_ensemble(model, n_seeds, seed=config.get("seed", 0)),
                  None, None)
        return {
            "config": config, "history": history,
            "save_path": str(save_path),
            "final_train_loss": history["train_loss"][-1],
            "final_val_loss": (history["val_loss"][-1]
                               if history["val_loss"] else None),
            "params_stack": params_stack,
        }

    t_chunk = [_time.perf_counter()]
    first_chunk = [True]

    def on_chunk(next_epoch, p, o, merged):
        now = _time.perf_counter()
        new_rows = {k: [[float(x) for x in row] for row in np.asarray(v)]
                    for k, v in merged.items()}
        n_new = len(new_rows["train"]) - (len(member_rows["train"])
                                          - start_epoch_rows)
        per_epoch = (now - t_chunk[0]) / max(n_new, 1)
        t_chunk[0] = now
        for k, kk in (("train", "train"), ("val", "val"), ("rel", "rel")):
            if kk in new_rows:
                member_rows[k] = member_rows_base[k] + new_rows[kk]
        epoch_walls.extend([per_epoch] * n_new)
        h = assemble_history()
        e = next_epoch - 1
        msg = f"Epoch {e:4d} | Train Loss: {h['train_loss'][-1]:.6f}"
        if h["val_loss"]:
            msg += f" | Val Loss: {h['val_loss'][-1]:.6f}"
        if h["relative_loss"]:
            msg += f" | Rel Loss: {h['relative_loss'][-1]:.4f}"
        msg += f" | Time: {per_epoch:.2f}s"
        # mark only the FIRST progress line after a resume (matching the
        # single-model paths' `epoch == start_epoch`): `merged` is
        # cumulative since start_epoch, so an arithmetic test on its
        # length is tautologically true on every chunk
        if resumed and first_chunk[0]:
            msg += " (resumed)"
        first_chunk[0] = False
        print(msg, flush=True)
        # collective: every process calls (orbax saves shards collectively;
        # msgpack writes on process 0 and barriers inside)
        save_checkpoint(ckpt_path, p, o, ckpt_histories(), backend=backend)

    member_rows_base = {k: list(v) for k, v in member_rows.items()}
    start_epoch_rows = len(member_rows["train"])

    params_stack, opt_state, _ = train_ensemble_full(
        model, data["process_type"], n_seeds=n_seeds, n_epochs=n_epochs,
        n_trajectories=data["n_train"],
        batch_size=config.get("batch_size"),
        obs_fraction=data.get("obs_fraction", 0.1),
        optimizer=tx,
        seed=config.get("seed", 0), data_seed=config.get("data_seed", 0),
        shuffle=config.get("shuffle", True),
        obs_only=bool(data.get("obs_only", False)),
        ignore_first_continuity=config.get("ignore_first_continuity", False),
        moment_weights=config.get("moment_weights"),
        variance_method=config.get("variance_method", "direct"),
        extended_moments=config.get("extended_moments", False),
        mesh=mesh, n_val=n_val, rel_eval=rel_eval,
        share_data=share_data, member_hparams=member_hparams,
        start_epoch=start_epoch, initial_state=initial_state,
        chunk_len=print_every, on_chunk=on_chunk,
        **{k: v for k, v in data.items()
           if k not in ("process_type", "n_train", "n_val", "obs_fraction",
                        "cache_data", "obs_only")})

    history = assemble_history()
    print(f"Trained {n_seeds}-member ensemble x {n_epochs - start_epoch} "
          f"epochs; final member losses "
          f"{[round(x, 4) for x in member_rows['train'][-1]]}")
    if lrs is not None:
        _print_population_winner(lrs, member_rows)
    save_checkpoint(ckpt_path, params_stack, opt_state, ckpt_histories(),
                    backend=backend)
    if is_primary:
        with open(save_path / "history.json", "w") as f:
            json.dump(history, f, indent=2)
    print(f"Experiment completed. Results saved to {save_path}")
    return {
        "config": config,
        "history": history,
        "save_path": str(save_path),
        "final_train_loss": history["train_loss"][-1],
        "final_val_loss": (history["val_loss"][-1]
                           if history["val_loss"] else None),
        "params_stack": params_stack,
    }
