"""njode_tpu — TPU-native Neural Jump ODE framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch library ``neural_jump_ode`` (see /root/reference):

* ``NeuralJumpODE``   — pure-functional jump-ODE model (jump encoder, latent
  ODE drift, per-moment readout), compiled to a single ``lax.scan`` over
  padded observation slots instead of Python loops over trajectories /
  observations / Euler substeps (reference: models/jump_ode.py:80-233).
* ``nj_ode_loss``      — two-term before/after-jump moment loss with masked
  reductions (reference: models/jump_ode.py:235-383).
* on-device SDE simulators + analytic conditional moments (``njode_tpu.simulation``),
* a whole-epoch-jitted ``Trainer`` and ``run_experiment`` (``njode_tpu.utils``),
* mesh data-parallelism / moment-axis sharding (``njode_tpu.parallel``),
* Pallas fused kernels for the hot scan cell (``njode_tpu.ops``).

The two-symbol public API mirrors the reference package root
(reference: neural_jump_ode/__init__.py:3-6).
"""

from .models import NeuralJumpODE, nj_ode_loss
from .serving import NJODEFilter
from .generative import sample_paths

__version__ = "0.1.0"

__all__ = ["NeuralJumpODE", "nj_ode_loss", "NJODEFilter", "sample_paths",
           "__version__"]
