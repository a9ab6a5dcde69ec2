"""Mixed-precision dtype policy for TPU.

The reference stack runs fp16 activations on ANE/GPU (and forces fp32 for the
SDXL VAE because fp16 overflows — reference README.md:383, torch2coreml.py:570-574).
On TPU the native fast dtype is bfloat16: same exponent range as fp32, so the
fp16-overflow workarounds are unnecessary, but we keep an fp32 VAE policy
switch for bit-quality parity experiments.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class Policy:
    """Dtype policy for a module family.

    - ``param_dtype``: dtype parameters are stored in (HBM residency).
    - ``compute_dtype``: dtype matmuls/convs run in (MXU wants bf16).
    - ``output_dtype``: dtype of module outputs handed to the next stage.
    """

    param_dtype: jnp.dtype = jnp.bfloat16
    compute_dtype: jnp.dtype = jnp.bfloat16
    output_dtype: jnp.dtype = jnp.float32

    def cast_to_compute(self, *xs):
        out = tuple(x.astype(self.compute_dtype) if x is not None else None for x in xs)
        return out[0] if len(out) == 1 else out

    def cast_to_output(self, x):
        return x.astype(self.output_dtype)


#: Default policy: bf16 params + compute, fp32 interfaces between stages.
DEFAULT_POLICY = Policy()

#: VAE policy. bf16 has fp32's exponent range, so the reference's fp16-overflow
#: special case (README.md:383) does not apply; kept fp32-compute-capable for
#: parity checks.
VAE_POLICY = Policy(param_dtype=jnp.float32, compute_dtype=jnp.float32,
                    output_dtype=jnp.float32)
