"""PyTorch↔JAX RNG bridge for bit-matching against the reference.

``torch.randn`` and ``jax.random.normal`` produce different streams, so
bit-matching reference runs (SURVEY §7.3) goes through *recorded noise*:
capture the exact noise tensors a torch run would draw, then feed them to
the samplers' ``noise_seq`` / explicit-noise entry points.

``record_reference_noise`` reproduces the reference sampler's draw order
(ref: src/model/SpeechGenerator.py:106-108 one q_sample draw, then one
randn_like per reverse step, :130-147): a single torch generator seeded
once, drawn in that exact order.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import numpy as np


def torch_randn(shape: Sequence[int], seed: int,
                generator_state: Optional[bytes] = None) -> np.ndarray:
    import torch

    g = torch.Generator()
    if generator_state is not None:
        g.set_state(torch.frombuffer(bytearray(generator_state),
                                     dtype=torch.uint8).clone())
    else:
        g.manual_seed(seed)
    return torch.randn(*shape, generator=g).numpy()


def record_reference_noise(latent_shape: Sequence[int], num_steps: int,
                           seed: int, *,
                           cond_by_audio: bool = False) -> Dict:
    """All noise a reference-order sampling run draws, in draw order.

    Returns {"prompt_noise": [*latent_shape],
             "init_noise":   [*latent_shape] or None (cond_by_audio),
             "step_noise":   [num_steps, *latent_shape]}.
    """
    import torch

    g = torch.Generator()
    g.manual_seed(seed)

    def draw():
        return torch.randn(*latent_shape, generator=g).numpy()

    prompt_noise = draw()                      # q_sample at t=T-1
    init_noise = None if cond_by_audio else draw()   # randn_like(audio_emb)
    step_noise = np.stack([draw() for _ in range(num_steps)])
    return {"prompt_noise": prompt_noise, "init_noise": init_noise,
            "step_noise": step_noise}
