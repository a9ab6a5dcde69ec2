"""Multi-chip inference sharding.

The reference has no multi-device execution at all (SURVEY.md §2.4); this is
the TPU-native scale-out for generation latency:

- ``make_spatial_sharded_forward``: spatial (sequence) parallelism — the
  latent H axis is sharded over the mesh's 'tp' axis.  GSPMD inserts the
  conv halo exchanges and the attention all-gathers; one denoiser forward
  uses every chip.  The right layout for big images (SDXL 1024² has 16k
  query positions) where per-chip FLOPs dominate.
- ``make_tensor_sharded_forward``: megatron-style tensor parallelism over
  attention/MLP projections (sharding.param_sharding_rules) with replicated
  activations — the right layout when weights/step-time dominate.

Both return jitted fns with explicit shardings so XLA lays collectives on
ICI.  CFG batch 2 additionally maps to the 'dp' axis when dp > 1.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .sharding import param_sharding_rules


def _replicated(mesh: Mesh):
    return NamedSharding(mesh, P())


def make_spatial_sharded_forward(model, mesh: Mesh, dp_batch: bool = True):
    """-> jitted fn(params, latents (B,H,W,C), t (B,), context (B,S,D)).

    Latents are sharded (dp?, tp, -, -): H split across 'tp' chips; params
    and context replicated.  GSPMD handles stride-2 downsampler halos and
    the (B, H*W, C) attention reshapes.
    """
    rep = _replicated(mesh)
    b_axis = "dp" if dp_batch and mesh.shape.get("dp", 1) > 1 else None
    lat = NamedSharding(mesh, P(b_axis, "tp", None, None))
    t_s = NamedSharding(mesh, P(b_axis))
    ctx = NamedSharding(mesh, P(b_axis, None, None))

    def fwd(params, latents, t, context):
        return model.apply({"params": params}, latents, t, context)

    return jax.jit(fwd, in_shardings=(rep, lat, t_s, ctx),
                   out_shardings=lat)


def make_tensor_sharded_forward(model, mesh: Mesh, params):
    """-> (sharded_params, jitted fn(params, latents, t, context)).

    Params follow the megatron column/row rules over 'tp'; activations are
    replicated (batch over 'dp' when present).  Returns the placed params so
    callers reuse the sharded copies across steps.
    """
    shardings = param_sharding_rules(params, mesh)
    placed = jax.tree.map(jax.device_put, params, shardings)
    b_axis = "dp" if mesh.shape.get("dp", 1) > 1 else None
    act = NamedSharding(mesh, P(b_axis, None, None, None))
    t_s = NamedSharding(mesh, P(b_axis))
    ctx = NamedSharding(mesh, P(b_axis, None, None))

    def fwd(params, latents, t, context):
        return model.apply({"params": params}, latents, t, context)

    fn = jax.jit(fwd, in_shardings=(shardings, act, t_s, ctx),
                 out_shardings=act)
    return placed, fn
