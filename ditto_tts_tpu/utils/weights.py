"""Local pretrained-weight loading (safetensors / torch .pth) helpers.

No network access is assumed anywhere: weights are loaded from local files
(e.g. a pre-downloaded HF snapshot directory) and fed to the per-model
importers (codec/encodec.py, text/gpt2.py, text/byt5.py, models/vocoder.py).
"""

from __future__ import annotations

import glob
import os
from typing import Dict

import numpy as np


def load_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Load a state dict from a .safetensors file, a directory of them,
    or a torch .pt/.pth/.bin file."""
    if os.path.isdir(path):
        files = sorted(glob.glob(os.path.join(path, "*.safetensors")))
        if not files:
            files = sorted(glob.glob(os.path.join(path, "*.bin")))
        sd: Dict[str, np.ndarray] = {}
        for f in files:
            sd.update(load_state_dict(f))
        if not sd:
            raise FileNotFoundError(f"no weight files under {path}")
        return sd
    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file
        try:
            return dict(load_file(path))
        except Exception:
            # bf16 etc. unsupported by numpy backend -> go through torch
            from safetensors.torch import load_file as load_torch
            return {k: v.float().numpy()
                    for k, v in load_torch(path).items()}
    # torch pickle formats
    from ..train.checkpoint import convert_torch_checkpoint
    return convert_torch_checkpoint(path)
