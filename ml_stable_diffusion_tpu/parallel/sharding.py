"""GSPMD sharding rules for diffusion model pytrees.

Pattern-based: megatron-style column/row parallel pairs for attention and
MLP projections (q/k/v/fc1 split on the output dim, out/fc2 on the input
dim, so each transformer block needs a single all-reduce), channel sharding
for large conv kernels, replication for norms and small params.  XLA inserts
the collectives; the rules only annotate layouts.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

#: column-parallel (shard output features over tp)
_COL = (
    # UNet / CLIP (attention qkv, MLP in, time-embed in)
    "to_q", "to_k", "to_v", "fc1", "geglu_proj", "linear_1",
    "q_proj", "k_proj", "v_proj", "proj_in",
    # MMDiT (models/mmdit.py): context-stream qkv, both FF ins, and the
    # adaLN modulation producers — their outputs are (B, kD) with NO token
    # axis, so the re-gather is trivial while the weights (1/3 of a joint
    # block's parameters) distribute over tp
    "add_q_proj", "add_k_proj", "add_v_proj", "ff_proj", "ff_context_proj",
    "norm1_linear", "norm1_context_linear", "norm_out_linear",
    "context_embedder",
    # T5 (models/t5.py): attention qkv and both gated-GELU ins
    "q", "k", "v", "wi_0", "wi_1",
)
#: row-parallel (shard input features over tp)
_ROW = ("to_out_0", "fc2", "linear_2", "out_proj",
        # MMDiT attention outs and FF outs
        "to_add_out", "ff_out", "ff_context_out",
        # T5 attention out and FF out
        "o", "wo")
# "proj_out" appears both in FeedForward (row) and SpatialTransformer (row):
_ROW = _ROW + ("proj_out",)


def _spec_for(path_names: tuple[str, ...], leaf, tp: int) -> P:
    name = path_names[-1] if path_names else ""
    parent = path_names[-2] if len(path_names) > 1 else ""
    if leaf.ndim == 2:
        # T5's token embedding table (module "shared", vocab × d_model):
        # shard the feature dim — 131M params on XXL; the one-time
        # all-gather before the first RMSNorm is (B, S, d_model)
        if parent == "shared" and name == "embedding" and leaf.shape[1] % tp == 0:
            return P(None, "tp")
        if parent in _COL and leaf.shape[1] % tp == 0:
            return P(None, "tp")
        if parent in _ROW and leaf.shape[0] % tp == 0:
            return P("tp", None)
        return P()
    if leaf.ndim == 4:  # HWIO conv kernels: shard output channels
        if leaf.shape[-1] % tp == 0 and leaf.shape[-1] >= tp * 8:
            return P(None, None, None, "tp")
        return P()
    if leaf.ndim == 3 and name == "pos_embed" and leaf.shape[-1] % tp == 0:
        # MMDiT learned positional table (M, M, D) — 57M params on medium;
        # sharded on D to match the patch conv's out-channel sharding
        return P(None, None, "tp")
    if leaf.ndim == 1 and parent in _COL and leaf.shape[0] % tp == 0:
        return P("tp")  # bias of a column-parallel projection
    return P()


def param_sharding_rules(params, mesh: Mesh):
    """params pytree -> pytree of NamedSharding."""
    tp = mesh.shape["tp"]

    def rule(path, leaf):
        names = tuple(p.key for p in path if hasattr(p, "key"))
        return NamedSharding(mesh, _spec_for(names, leaf, tp))

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_params(params, mesh: Mesh):
    """Place a param pytree onto the mesh per the rules."""
    shardings = param_sharding_rules(params, mesh)
    return jax.tree.map(jax.device_put, params, shardings)


def batch_sharding(mesh: Mesh, ndim: int = 4) -> NamedSharding:
    """Leading-axis data-parallel sharding for activations/batches."""
    return NamedSharding(mesh, P("dp", *([None] * (ndim - 1))))
