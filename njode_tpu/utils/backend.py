"""Backend bootstrap with graceful degradation.

Some TPU environments register their PJRT plugin via sitecustomize and pin
``jax_platforms`` to it; if that registration fails (device busy, tunnel
flake), every ``jax.devices()`` call raises even though a CPU backend is
available.  ``ensure_backend()`` detects that state and falls back to
automatic platform selection with a loud warning — the moral equivalent of
the reference's CUDA->CPU auto-resolve (reference utils/training.py:370-372).
"""

from __future__ import annotations

import sys


def ensure_backend():
    """Return jax.devices(), falling back to auto platform selection."""
    import jax

    try:
        return jax.devices()
    except RuntimeError as e:
        print(f"Warning: backend init failed ({e}); falling back to "
              f"automatic platform selection.", file=sys.stderr)
        try:
            from jax.extend.backend import clear_backends
            clear_backends()
        except Exception:
            pass
        jax.config.update("jax_platforms", "")
        return jax.devices()
