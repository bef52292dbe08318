"""Dtype policy for TPU execution.

TPU MXU wants bf16 operands with fp32 accumulation; params are kept fp32 and
cast at the compute boundary. A policy is threaded explicitly (no globals) so
tests can force fp32 everywhere for golden comparisons against fp64/fp32
oracles.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class DTypePolicy:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    # Numerically sensitive ops (LayerNorm stats, softmax, schedules) always
    # run in at least this dtype.
    reduce_dtype: jnp.dtype = jnp.float32

    def cast_in(self, x):
        return x.astype(self.compute_dtype)

    def cast_out(self, x):
        return x.astype(self.param_dtype)


#: Full-precision policy for golden tests and bit-matching vs the reference.
FP32 = DTypePolicy(param_dtype=jnp.float32, compute_dtype=jnp.float32)

#: Default TPU policy: fp32 params, bf16 matmul operands, fp32 accumulation.
BF16 = DTypePolicy()


def default_policy() -> DTypePolicy:
    return FP32
