"""TPU compiler options for the hot jitted programs.

Measured on the headline bench (SD-2.1 512², CFG batch 2): raising the
scoped-VMEM fusion budget from the compiler default gives the
conv-emitter-bound UNet step +2% — more VMEM scratch lets the emitter pick
wider conv fusions — but overshooting starves the async-copy double
buffers.  Sweep: default 54.3-54.5, 32 MiB **55.57**, 64 MiB 55.36,
96 MiB 52.11 iter/s.  Default 32 MiB; tunable via SDTPU_SCOPED_VMEM_KIB
(``0``/``default`` disables the override).

The options ride per-jit ``compiler_options`` (jax 0.9 kwarg) rather than
XLA_FLAGS: this environment compiles through the remote axon tunnel, and
per-compile options are the only path verified to reach that compiler (env
flags are swallowed like JAX_PLATFORMS/JAX_COMPILATION_CACHE_DIR, see
CLAUDE.md).
"""

from __future__ import annotations

import os

import jax

_SCOPED_VMEM_KIB = os.environ.get("SDTPU_SCOPED_VMEM_KIB", "32768")


def tpu_compiler_options() -> dict | None:
    """Compiler options for the current backend; None off-TPU (option names
    are TPU-specific and would fail the CPU/GPU compilers)."""
    if jax.default_backend() != "tpu":
        return None
    if _SCOPED_VMEM_KIB in ("", "0", "default"):
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": _SCOPED_VMEM_KIB}


def sdtpu_jit(fun=None, **jit_kwargs):
    """``jax.jit`` with the framework's TPU compiler options applied.

    Usable as ``sdtpu_jit(fn)`` or ``@sdtpu_jit`` or with jit kwargs.
    """
    if fun is None:
        def deco(f):
            return sdtpu_jit(f, **jit_kwargs)
        return deco
    opts = tpu_compiler_options()
    if opts and "compiler_options" not in jit_kwargs:
        jit_kwargs["compiler_options"] = opts
    return jax.jit(fun, **jit_kwargs)
