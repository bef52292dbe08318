from .core import (
    Linear,
    LayerNorm,
    Embedding,
    dense,
    layer_norm,
    embed,
)
