"""Mixed-precision (bfloat16) compute mode.

``compute_dtype=bfloat16`` runs the three MLPs with params/activations cast
to bf16 (halving HBM traffic for weights/activations — the TPU win appears
at hidden_dim >= 256) while master params, the latent Euler carry, time
features and outputs stay float32.  No reference analogue (the reference is
f32 PyTorch throughout).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from njode_tpu import NeuralJumpODE
from njode_tpu.models import nj_ode_loss_dense
from njode_tpu.simulation import simulate_batch


def _batch(B=32):
    return simulate_batch(jax.random.PRNGKey(1), B, "black_scholes",
                          obs_fraction=0.1, mu=0.1, sigma=0.5)


@pytest.mark.parametrize("dt_ode_step", [None, 0.02])
def test_bf16_forward_close_to_f32(dt_ode_step):
    kw = dict(input_dim=1, hidden_dim=64, output_dim=1, num_moments=2,
              activation="tanh", dt_ode_step=dt_ode_step)
    m32 = NeuralJumpODE(**kw)
    m16 = NeuralJumpODE(**kw, compute_dtype="bfloat16")
    params = m32.init(jax.random.PRNGKey(0))
    b = _batch()
    p32, pb32 = m32.apply(params, b.times, b.values, b.mask)
    p16, pb16 = m16.apply(params, b.times, b.values, b.mask)
    assert p16.dtype == jnp.float32  # outputs restored to f32
    scale = np.maximum(np.abs(np.asarray(p32)), 1.0)
    assert np.max(np.abs(np.asarray(p16) - np.asarray(p32)) / scale) < 0.05
    scale_b = np.maximum(np.abs(np.asarray(pb32)), 1.0)
    assert np.max(np.abs(np.asarray(pb16) - np.asarray(pb32)) / scale_b) < 0.05


def test_bf16_training_step_keeps_f32_params():
    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2, compute_dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0))
    b = _batch()
    opt = optax.adam(1e-2)
    state = opt.init(params)

    @jax.jit
    def step(p, s):
        def loss_fn(p):
            preds, before = model.apply(p, b.times, b.values, b.mask)
            return nj_ode_loss_dense(b.values, preds, before, b.mask,
                                     moment_weights=(1.0, 10.0))
        l, g = jax.value_and_grad(loss_fn)(p)
        u, s = opt.update(g, s, p)
        return optax.apply_updates(p, u), s, l

    l0 = None
    for _ in range(60):
        params, state, l = step(params, state)
        l0 = float(l) if l0 is None else l0
    assert float(l) < l0 / 2
    # master params (and hence gradients/optimizer moments) stayed f32
    assert all(a.dtype == jnp.float32
               for a in jax.tree_util.tree_leaves(params))


def test_bf16_inference_paths_run():
    model = NeuralJumpODE(input_dim=1, hidden_dim=32, output_dim=1,
                          num_moments=2, compute_dtype="bf16")
    params = model.init(jax.random.PRNGKey(0))
    b = _batch(8)
    out = model.predict_at(params, b.times, b.values,
                           jnp.linspace(0.0, 1.0, 7)[None].repeat(8, 0),
                           mask=b.mask)
    assert out["mean"].dtype == jnp.float32
    assert np.isfinite(np.asarray(out["mean"])).all()
    grid = model.predict_on_grid(params, b.grid_times,
                                 jnp.zeros(b.paths.shape[:2], bool)
                                 .at[:, 0].set(True), b.paths[..., None])
    assert np.isfinite(np.asarray(grid["mean"])).all()


def test_compute_dtype_string_validation():
    with pytest.raises(ValueError):
        NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                      compute_dtype="float8")
    # 'float32' string means full precision (None)
    m = NeuralJumpODE(input_dim=1, hidden_dim=8, output_dim=1,
                      compute_dtype="float32")
    assert m.compute_dtype is None
