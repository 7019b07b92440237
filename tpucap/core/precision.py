"""Mixed-precision policy for TPU.

MXU-friendly default: bfloat16 compute for conv/matmul-heavy encoder and
decoder paths, float32 parameters and float32 loss/softmax accumulations.
The reference runs pure float32 (Keras default); ``Precision.FLOAT32`` exists
for parity testing.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Precision:
    param_dtype: jnp.dtype = jnp.float32
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_compute(self, x):
        return x.astype(self.compute_dtype)

    def cast_output(self, x):
        return x.astype(self.output_dtype)

    @classmethod
    def bf16(cls) -> "Precision":
        return cls()

    @classmethod
    def f32(cls) -> "Precision":
        return cls(compute_dtype=jnp.float32)


DEFAULT_PRECISION = Precision.bf16()
FLOAT32 = Precision.f32()
