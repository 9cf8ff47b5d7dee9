"""njode_tpu — TPU-native Neural Jump ODE framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the reference
PyTorch library ``neural_jump_ode`` (see /root/reference):

* ``NeuralJumpODE``   — pure-functional jump-ODE model (jump encoder, latent
  ODE drift, per-moment readout) with a SCAN-FREE batched forward: the jump
  resets the latent state at every observation, so all padded observation
  slots fold into large batched matmuls instead of Python loops over
  trajectories / observations / Euler substeps
  (reference: models/jump_ode.py:80-233).
* ``nj_ode_loss``      — two-term before/after-jump moment loss with masked
  reductions (reference: models/jump_ode.py:235-383).
* on-device SDE simulators + analytic conditional moments (``njode_tpu.simulation``),
* a whole-epoch-jitted ``Trainer`` and ``run_experiment`` (``njode_tpu.utils``),
* mesh data/expert/tensor parallelism (``njode_tpu.parallel``),
* Pallas kernels — the fused whole-gap substep loop and the fused Euler
  cell, both gated by measurement (``njode_tpu.ops``),
* serving (``NJODEFilter``, ``predict_at``) and generative sampling
  (``sample_paths``).

The two-symbol public API mirrors the reference package root
(reference: neural_jump_ode/__init__.py:3-6).
"""

from .models import NeuralJumpODE, nj_ode_loss
from .serving import NJODEFilter
from .generative import sample_paths

__version__ = "0.1.0"

__all__ = ["NeuralJumpODE", "nj_ode_loss", "NJODEFilter", "sample_paths",
           "__version__"]
