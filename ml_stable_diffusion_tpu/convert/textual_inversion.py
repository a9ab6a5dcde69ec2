"""Textual-inversion embedding loading (beyond the reference).

A textual-inversion ("TI") embedding is a learned set of token vectors that
a placeholder word expands to — the lightest personalization format in the
SD ecosystem.  On-disk variants covered:

- **a1111 .pt** (pickled): ``{"string_to_param": {"*": (n, d) tensor},
  "name": "<token>"}``.
- **kohya / a1111 .safetensors**: ``{"emb_params": (n, d)}`` for SD, or
  ``{"clip_l": (n, 768), "clip_g": (n, 1280)}`` for SDXL dual encoders.
- **diffusers .safetensors**: a single ``{token: (n, d)}`` entry.

Serving design: the CLIP embedding table is EXTENDED with the new rows
(the Flax module is stateless — a config with a larger vocab_size is free)
and the tokenizer expands the placeholder to the new row indices; the
compiled programs are untouched except for the embedding-table shape,
which jit retraces on automatically.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np

from .native_io import load_file


def _np2d(t) -> np.ndarray:
    if hasattr(t, "detach"):
        t = t.detach().cpu().float().numpy()
    arr = np.asarray(t, dtype=np.float32)
    if arr.ndim == 1:
        arr = arr[None]
    if arr.ndim != 2:
        raise ValueError(f"TI embedding must be (n, dim); got {arr.shape}")
    return arr


def load_ti_embedding(source) -> tuple[dict[str, np.ndarray], str | None]:
    """-> ({"clip_l": (n, d)[, "clip_g": (n, d2)]}, suggested token or None).

    ``source``: path (.safetensors or torch-pickled .pt/.bin), a raw dict
    of either layout, or an (n, d) array."""
    if isinstance(source, np.ndarray):
        return {"clip_l": _np2d(source)}, None
    if isinstance(source, dict):
        raw = source
    else:
        path = Path(source)
        if path.suffix == ".safetensors":
            raw = load_file(path)
        else:
            import torch

            try:
                raw = torch.load(path, map_location="cpu", weights_only=True)
            except Exception:
                # a1111 .pt files carry non-tensor metadata in the pickle
                raw = torch.load(path, map_location="cpu",
                                 weights_only=False)
    if "string_to_param" in raw:  # a1111 .pt
        params = raw["string_to_param"]
        arr = next(iter(params.values()))
        name = raw.get("name")
        return {"clip_l": _np2d(arr)}, (str(name) if name else None)
    if "emb_params" in raw:
        return {"clip_l": _np2d(raw["emb_params"])}, None
    if "clip_l" in raw or "clip_g" in raw:
        out = {k: _np2d(raw[k]) for k in ("clip_l", "clip_g") if k in raw}
        ns = {v.shape[0] for v in out.values()}
        if len(ns) != 1:
            raise ValueError(f"clip_l/clip_g vector counts differ: {ns}")
        return out, None
    tensors = {k: v for k, v in raw.items()
               if hasattr(v, "shape") and k != "name"}
    if len(tensors) == 1:  # diffusers {token: tensor}
        (token, arr), = tensors.items()
        return {"clip_l": _np2d(arr)}, token
    raise ValueError(
        f"unrecognized textual-inversion layout (keys: {sorted(raw)})")


def extend_token_embedding(model, params: dict, rows: np.ndarray):
    """Return (model', params') with ``rows`` appended to the CLIP token
    embedding table and the config's vocab_size grown to match."""
    import dataclasses

    cfg = model.config
    if rows.shape[1] != cfg.hidden_size:
        raise ValueError(
            f"TI embedding dim {rows.shape[1]} != encoder hidden size "
            f"{cfg.hidden_size}")
    new_cfg = dataclasses.replace(cfg,
                                  vocab_size=cfg.vocab_size + rows.shape[0])
    new_model = dataclasses.replace(model, config=new_cfg)
    table = params["token_embedding"]["embedding"]
    base = np.asarray(table)
    new_table = np.concatenate([base, rows.astype(base.dtype)], axis=0)
    if not isinstance(table, np.ndarray):
        import jax.numpy as jnp

        new_table = jnp.asarray(new_table)
    new_params = dict(params)
    new_params["token_embedding"] = {"embedding": new_table}
    return new_model, new_params
