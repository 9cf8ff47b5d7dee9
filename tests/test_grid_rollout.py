"""predict_on_grid parity with the reference's plotting-rollout semantics.

The reference re-implements NJ-ODE inference inside
utils/plotting.py:146-256 with per-grid-cell Euler substeps
(``n_sub = max(1, int(dt/dt_ode_step))``) and jump resets at observation
points; our ``predict_on_grid`` is the single canonical rollout.  This test
replays the reference's loop using the reference model's OWN euler_step /
jump components and demands agreement.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from njode_tpu import NeuralJumpODE
from njode_tpu.utils.torch_compat import params_from_torch_state_dict


@pytest.mark.parametrize("dt_ode_step", [None, 0.02])
@pytest.mark.parametrize("shared", [False, True])
def test_grid_rollout_matches_reference_semantics(torch_reference, dt_ode_step,
                                                  shared):
    import torch
    torch.manual_seed(3)
    K = 2
    ref_model = torch_reference.models.jump_ode.NeuralJumpODE(
        input_dim=1, hidden_dim=16, output_dim=1, dt_ode_step=dt_ode_step,
        num_moments=K, shared_network=shared, variance_method="direct")
    ref_model.eval()
    model = NeuralJumpODE(input_dim=1, hidden_dim=16, output_dim=1,
                          dt_ode_step=dt_ode_step, num_moments=K,
                          shared_network=shared, variance_method="direct",
                          t_max=1.0)
    params = params_from_torch_state_dict(ref_model.state_dict(), K, shared)

    # dense grid + observations (grid indices 0, 7, 13, 19)
    G = 21
    grid = np.linspace(0.0, 1.0, G).astype(np.float32)
    obs_idx = np.array([0, 7, 13, 19])
    rng = np.random.default_rng(0)
    path = rng.normal(1.0, 0.2, size=G).astype(np.float32)

    # ---- reference semantics replay (utils/plotting.py:146-256) ----
    with torch.no_grad():
        ref_out = np.zeros((G, 1, K), np.float32)
        t_grid = torch.tensor(grid)
        num_m = 1 if shared else K
        for i in range(len(obs_idx)):
            lo = obs_idx[i]
            hi = obs_idx[i + 1] if i + 1 < len(obs_idx) else None
            x_i = torch.tensor([[path[lo]]])
            if shared:
                h_list = [ref_model.jump_nn(x_i)]
            else:
                h_list = [ref_model.jump_nns[m](x_i) for m in range(num_m)]
            t_cur = t_grid[lo]
            ks = range(lo, (hi + 1) if hi is not None else G)
            for k in ks:
                t_target = t_grid[k]
                if t_target > t_cur:
                    if ref_model.dt_ode_step is None:
                        n_sub = 1
                    else:
                        n_sub = max(1, int((t_target - t_cur)
                                           / ref_model.dt_ode_step))
                    dt = (t_target - t_cur) / float(n_sub)
                    for _ in range(n_sub):
                        t_new = t_cur + dt
                        h_list = ref_model.euler_step(h_list, x_i, t_cur,
                                                      t_new)
                        t_cur = t_new
                if shared:
                    y = ref_model.output_nn(h_list[0]).view(1, 1, K)
                else:
                    y = torch.stack(
                        [ref_model.output_nns[m](h_list[m])
                         for m in range(K)], dim=-1)
                ref_out[k] = y[0].numpy()
        # interval ends are overwritten by the next interval's jump readout,
        # exactly as in the reference (overlapping [T_i, T_next] masks)

    # ---- ours ----
    obs_mask = jnp.zeros((1, G), bool).at[0, jnp.asarray(obs_idx)].set(True)
    out = model.predict_on_grid(params, jnp.asarray(grid), obs_mask,
                                jnp.asarray(path)[None, :, None])
    got = np.asarray(out["raw"][0])

    np.testing.assert_allclose(got, ref_out, rtol=5e-4, atol=1e-5)
    # variance post-processing: direct method -> W^2
    np.testing.assert_allclose(np.asarray(out["var"][0]), ref_out[:, :, 1] ** 2,
                               rtol=1e-3, atol=1e-5)
