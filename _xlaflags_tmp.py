"""One-shot: does raising xla_tpu_scoped_vmem_limit_kib help the SD-2.1
headline scan?  Uses AOT lower/compile with compiler_options."""
import os, sys, time
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/sdtpu_jax_cache")
import jax
jax.config.update("jax_compilation_cache_dir", os.environ["JAX_COMPILATION_CACHE_DIR"])
import jax.numpy as jnp

from bench import _sd21_parts, STEPS

opts = {}
if len(sys.argv) > 1 and sys.argv[1] != "default":
    opts = {"xla_tpu_scoped_vmem_limit_kib": sys.argv[1]}

cfg, params, make_scan, context, fresh = _sd21_parts()
denoise = make_scan(lambda p: p)
lowered = jax.jit(denoise).lower(params, fresh(0), context)
compiled = lowered.compile(compiler_options=opts) if opts else lowered.compile()

compiled(params, fresh(0), context).block_until_ready()
times = []
for i in range(3):
    lat = fresh(i + 1)
    lat.block_until_ready()
    t = time.perf_counter()
    compiled(params, lat, context).block_until_ready()
    times.append(time.perf_counter() - t)
print("opts", opts, "iter_s", round(STEPS / min(times), 3))
