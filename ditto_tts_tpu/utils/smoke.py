"""Information-preserving re-init for RANDOM smoke models.

Problem: the default random init of deep conv stacks (codec SEANet,
BigVGAN) is contractive — through ~10 layers the input-dependent signal
attenuates ~300x below the layers' own bias/transient floor, so a
random-init codec maps EVERY input to the same nearest-neighbor codes and
a random vocoder renders near input-independent audio. Trained weights
are information-preserving; smoke runs that stand in for them (no
pretrained assets in this environment) must be too, or eval harnesses
measure nothing.

Fix: re-draw every weight matrix/kernel as a scaled orthogonal matrix
(rows of a QR factor), the standard dynamical-isometry init. ``gain``
~1.2 compensates the ELU/activation contraction per layer. Biases and
1-D params (norm scales, snake alpha/beta) are left as initialized.

Used by scripts/evaluate.py (--smoke-ortho) and
scripts/eval_discrimination.py. Never applied to loaded checkpoints.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def orthogonal_reinit(tree, *, gain: float = 1.2, seed: int = 0):
    """Replace every leaf with ndim >= 2 by gain * (semi-)orthogonal
    matrix of the same shape (reshaped [dim0, rest])."""
    rng = np.random.default_rng(seed)

    def f(path, leaf):
        a = np.asarray(leaf)
        if a.ndim < 2:
            return leaf
        flat_shape = (a.shape[0], int(np.prod(a.shape[1:])))
        rows, cols = flat_shape
        m = rng.standard_normal((max(rows, cols), min(rows, cols)))
        q, _ = np.linalg.qr(m)
        w = q[:rows, :cols] if rows >= cols else q[:cols, :rows].T
        return jnp.asarray((gain * w).reshape(a.shape), leaf.dtype)

    return jax.tree_util.tree_map_with_path(f, tree)
