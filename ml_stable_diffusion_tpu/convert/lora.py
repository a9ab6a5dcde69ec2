"""LoRA adapter loading + merging (beyond the reference).

The reference has no adapter support; LoRA is the dominant Stable Diffusion
personalization format, so a framework replacing it needs one.  Two on-disk
formats cover the ecosystem:

- **kohya / sd-scripts** (the civitai standard): flat safetensors with keys
  ``lora_unet_<module path, dots mangled to underscores>.lora_down.weight``
  / ``.lora_up.weight`` / ``.alpha``; text-encoder modules under
  ``lora_te_`` (SD) or ``lora_te1_`` / ``lora_te2_`` (SDXL dual encoders).
- **diffusers PEFT**: ``unet.<module>.lora_A.weight`` / ``.lora_B.weight``
  (prefixes ``text_encoder.``, ``text_encoder_2.``, ``transformer.`` for
  SD3), plus the older attn-processor spelling
  ``<block>.attn1.processor.to_q_lora.down.weight``.

Merge-at-load is the TPU-native design (same conclusion as palettized
serving, compress/palettize.py): ``W' = W + scale * (alpha/r) * up @ down``
computed host-side in fp32 and cast back to the leaf dtype.  Serving cost
is zero — compiled programs take params as jit ARGUMENTS
(``_params_bundle``), so a merge (or un-merge) never recompiles, and a
LoRA swap is a host-side tree update.  ``StableDiffusionPipeline
.apply_lora`` keeps pristine host copies of only the touched leaves, so
``clear_loras`` restores bit-exactly (float add is not invertible).
"""

from __future__ import annotations

import dataclasses
import re
from pathlib import Path

import numpy as np

from .native_io import load_file

#: adapter targets -> pipeline component
TARGET_UNET = "unet"
TARGET_TE = "text_encoder"
TARGET_TE2 = "text_encoder_2"
TARGET_TRANSFORMER = "transformer"  # SD3 MMDiT


@dataclasses.dataclass
class LoRAModule:
    """One adapted layer: ``delta_W = (alpha/rank) * up @ down``."""

    down: np.ndarray  # (r, in) or (r, in, kh, kw)
    up: np.ndarray    # (out, r) or (out, r, 1, 1)
    alpha: float | None = None  # None -> rank (factor 1.0)

    @property
    def rank(self) -> int:
        return self.down.shape[0]

    def delta(self, scale: float = 1.0) -> np.ndarray:
        """torch-layout weight delta: (out, in) or (out, in, kh, kw)."""
        alpha = self.rank if self.alpha is None else self.alpha
        s = scale * alpha / self.rank
        up, down = np.float32(self.up), np.float32(self.down)
        if down.ndim == 2 and up.ndim == 2:
            return s * (up @ down)
        if down.ndim == 4 and up.ndim == 4:
            # conv LoRA (LoCon): up is (out, r, 1, 1), down (r, in, kh, kw)
            r, cin, kh, kw = down.shape
            d = up[:, :, 0, 0] @ down.reshape(r, cin * kh * kw)
            return s * d.reshape(up.shape[0], cin, kh, kw)
        raise ValueError(
            f"unsupported LoRA factor ranks: down{down.shape} up{up.shape} "
            "(LoHa/LoKr decompositions are not supported)")


@dataclasses.dataclass
class LoRAAdapter:
    """Parsed adapter: {(target, diffusers module path) -> LoRAModule}."""

    modules: dict[tuple[str, str], LoRAModule]
    name: str = "lora"

    def targets(self) -> set[str]:
        return {t for t, _ in self.modules}


# ---------------------------------------------------------------------------
# parsing

_KOHYA_PREFIXES = (
    ("lora_unet_", TARGET_UNET),
    ("lora_te1_", TARGET_TE),
    ("lora_te2_", TARGET_TE2),
    ("lora_te_", TARGET_TE),
    ("lora_transformer_", TARGET_TRANSFORMER),
)

#: ordered rewrites turning kohya's underscore-mangled UNet module path back
#: into the dotted diffusers path.  Index-bearing containers first; leaf
#: names that legitimately contain underscores (to_q, proj_in, conv_shortcut,
#: time_emb_proj, ...) are left alone.
_KOHYA_UNET_RULES = [
    (re.compile(r"^(down|up)_blocks_(\d+)_"), r"\1_blocks.\2."),
    (re.compile(r"^mid_block_"), "mid_block."),
    (re.compile(r"(attentions|resnets|downsamplers|upsamplers)_(\d+)_"),
     r"\1.\2."),
    (re.compile(r"transformer_blocks_(\d+)_"), r"transformer_blocks.\1."),
    (re.compile(r"(attn\d)_"), r"\1."),
    (re.compile(r"ff_net_0_proj$"), "ff.net.0.proj"),
    (re.compile(r"ff_net_2$"), "ff.net.2"),
    (re.compile(r"to_out_0$"), "to_out.0"),
    (re.compile(r"^time_embedding_linear_(\d)$"), r"time_embedding.linear.\1"),
    (re.compile(r"^add_embedding_linear_(\d)$"), r"add_embedding.linear.\1"),
]

_KOHYA_TE_RULES = [
    (re.compile(r"^text_model_encoder_layers_(\d+)_(self_attn|mlp)_"),
     r"text_model.encoder.layers.\1.\2."),
]

#: SD3 MMDiT (diffusers SD3Transformer2DModel module paths)
_KOHYA_TRANSFORMER_RULES = [
    (re.compile(r"^transformer_blocks_(\d+)_"), r"transformer_blocks.\1."),
    (re.compile(r"(attn|ff_context|ff)_"), r"\1."),
    (re.compile(r"net_0_proj$"), "net.0.proj"),
    (re.compile(r"net_2$"), "net.2"),
    (re.compile(r"to_out_0$"), "to_out.0"),
    (re.compile(r"norm1(_context)?_linear$"), r"norm1\1.linear"),
    (re.compile(r"^norm_out_linear$"), "norm_out.linear"),
]


#: kohya's SDXL trainer addresses the original Stability sgm UNet
#: (input_blocks / middle_block / output_blocks).  With layers_per_block=2
#: every diffusers block spans 3 sgm indices: down block = (i-1)//3 at
#: layer (i-1)%3, up block = i//3 at layer i%3 — the same arithmetic the
#: diffusers non-diffusers-LoRA loader applies.
_SGM_IO_RE = re.compile(r"^(input|output)_blocks_(\d+)_(\d+)_(.+)$")
_SGM_MID_RE = re.compile(r"^middle_block_(\d)_(.+)$")
_SGM_RES_LEAF = {"in_layers_2": "conv1", "out_layers_3": "conv2",
                 "emb_layers_1": "time_emb_proj",
                 "skip_connection": "conv_shortcut"}


def _demangle_rest(rest: str, rules) -> str:
    out = rest
    for pat, repl in rules:
        out = pat.sub(repl, out)
    return out


def _sgm_demangle(mangled: str) -> str | None:
    """kohya-SDXL sgm module path -> diffusers module path (None if the key
    is not sgm-named)."""
    m = _SGM_MID_RE.match(mangled)
    if m:
        idx, rest = int(m.group(1)), m.group(2)
        if idx == 1:
            return ("mid_block.attentions.0."
                    + _demangle_rest(rest, _KOHYA_UNET_RULES))
        return (f"mid_block.resnets.{idx // 2}."
                + _SGM_RES_LEAF[rest])
    m = _SGM_IO_RE.match(mangled)
    if not m:
        return None
    kind, i, sub, rest = (m.group(1), int(m.group(2)), int(m.group(3)),
                          m.group(4))
    if kind == "input":
        side, block, layer = "down_blocks", (i - 1) // 3, (i - 1) % 3
    else:
        side, block, layer = "up_blocks", i // 3, i % 3
    if sub == 0 and rest == "op":  # sgm downsample conv
        return f"down_blocks.{block}.downsamplers.0.conv"
    if rest == "conv":  # sgm upsample conv (module index varies with attn)
        return f"up_blocks.{block}.upsamplers.0.conv"
    if sub == 0:
        return f"{side}.{block}.resnets.{layer}." + _SGM_RES_LEAF[rest]
    return (f"{side}.{block}.attentions.{layer}."
            + _demangle_rest(rest, _KOHYA_UNET_RULES))


def _kohya_demangle(target: str, mangled: str) -> str:
    if target == TARGET_UNET:
        sgm = _sgm_demangle(mangled)
        if sgm is not None:
            return sgm
    rules = {TARGET_UNET: _KOHYA_UNET_RULES,
             TARGET_TE: _KOHYA_TE_RULES,
             TARGET_TE2: _KOHYA_TE_RULES,
             TARGET_TRANSFORMER: _KOHYA_TRANSFORMER_RULES}[target]
    return _demangle_rest(mangled, rules)


_PEFT_PREFIXES = (
    ("unet.", TARGET_UNET),
    ("text_encoder.", TARGET_TE),
    ("text_encoder_2.", TARGET_TE2),
    ("transformer.", TARGET_TRANSFORMER),
)

# old diffusers attn-processor spelling -> module path + up/down side
_PROCESSOR_RE = re.compile(
    r"^(?P<base>.+)\.processor\.(?P<mod>to_q|to_k|to_v|to_out)_lora\."
    r"(?P<side>up|down)\.weight$")


def parse_lora_state_dict(sd: dict, name: str = "lora") -> LoRAAdapter:
    """Flat {key: np.ndarray} (either on-disk format) -> LoRAAdapter."""
    mods: dict[tuple[str, str], dict] = {}

    def slot(target, module):
        return mods.setdefault((target, module), {})

    for key, val in sd.items():
        if key.startswith("lora_"):  # kohya
            for prefix, target in _KOHYA_PREFIXES:
                if key.startswith(prefix):
                    rest = key[len(prefix):]
                    break
            else:
                raise ValueError(f"unrecognized kohya LoRA key: {key}")
            if rest.endswith(".lora_down.weight"):
                side, mangled = "down", rest[: -len(".lora_down.weight")]
            elif rest.endswith(".lora_up.weight"):
                side, mangled = "up", rest[: -len(".lora_up.weight")]
            elif rest.endswith(".alpha"):
                side, mangled = "alpha", rest[: -len(".alpha")]
            else:
                continue  # .lora_mid (LoHa parts) surface in delta() error
            module = _kohya_demangle(target, mangled)
            slot(target, module)[side] = val
            continue

        m = _PROCESSOR_RE.match(key)
        if m:  # old diffusers attn-processor format (unet only)
            mod = m.group("mod")
            module = f"{m.group('base')}.{'to_out.0' if mod == 'to_out' else mod}"
            slot(TARGET_UNET, module)[m.group("side")] = val
            continue

        for prefix, target in _PEFT_PREFIXES:  # diffusers PEFT
            if key.startswith(prefix):
                rest = key[len(prefix):]
                if rest.endswith(".lora_A.weight"):
                    side, module = "down", rest[: -len(".lora_A.weight")]
                elif rest.endswith(".lora_B.weight"):
                    side, module = "up", rest[: -len(".lora_B.weight")]
                elif rest.endswith(".alpha"):
                    side, module = "alpha", rest[: -len(".alpha")]
                else:
                    raise ValueError(f"unrecognized PEFT LoRA key: {key}")
                slot(target, module)[side] = val
                break
        else:
            raise ValueError(f"unrecognized LoRA key: {key}")

    out: dict[tuple[str, str], LoRAModule] = {}
    for (target, module), parts in mods.items():
        if "down" not in parts or "up" not in parts:
            raise ValueError(
                f"LoRA module {target}:{module} is missing a factor "
                f"(got {sorted(parts)})")
        alpha = parts.get("alpha")
        out[(target, module)] = LoRAModule(
            down=np.asarray(parts["down"]), up=np.asarray(parts["up"]),
            alpha=(None if alpha is None
                   else float(np.asarray(alpha).reshape(-1)[0])))
    return LoRAAdapter(modules=out, name=name)


def load_lora(path: str | Path) -> LoRAAdapter:
    """Read a LoRA adapter from a .safetensors file."""
    path = Path(path)
    return parse_lora_state_dict(load_file(path), name=path.stem)


# ---------------------------------------------------------------------------
# diffusers module path -> Flax param path

def unet_flax_path(module: str) -> tuple[str, ...]:
    """diffusers UNet module path -> path in models/unet.py params
    (mirrors convert/unet.py port_unet's grouping)."""
    parts = module.split(".")
    if parts[0] in ("down_blocks", "up_blocks", "mid_block"):
        n = 3 if parts[0] == "mid_block" else 4
        head, rest = "_".join(parts[:n]), parts[n:]
    elif parts[0] in ("conv_in", "conv_out"):
        return (parts[0],)
    elif parts[0] in ("time_embedding", "add_embedding"):
        return (parts[0], "_".join(parts[1:]))
    else:
        raise KeyError(f"unsupported UNet LoRA module: {module}")
    out: list[str] = [head]
    i = 0
    while i < len(rest):
        t = rest[i]
        if t == "transformer_blocks":
            out.append(f"transformer_blocks_{rest[i + 1]}")
            i += 2
        elif t == "to_out":
            out.append("to_out_0")
            i += 2
        elif t == "ff":
            sub = rest[i + 1:]
            if sub[:3] == ["net", "0", "proj"]:
                out += ["ff", "geglu_proj"]
                i += 4
            elif sub[:2] == ["net", "2"]:
                out += ["ff", "proj_out"]
                i += 3
            else:
                raise KeyError(f"unsupported UNet LoRA module: {module}")
        else:
            out.append(t)
            i += 1
    return tuple(out)


def clip_flax_path(module: str) -> tuple[str, ...]:
    """transformers CLIPTextModel module path -> models/clip.py params."""
    p = module.split(".")
    if p and p[0] == "text_model":
        p = p[1:]
    if p and p[0] == "encoder":
        p = p[1:]
    if len(p) >= 3 and p[0] == "layers" and p[-1] in (
            "q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"):
        return (f"layers_{p[1]}", p[-1])
    raise KeyError(f"unsupported text-encoder LoRA module: {module}")


_MMDIT_ATTN = {"to_q", "to_k", "to_v", "add_q_proj", "add_k_proj",
               "add_v_proj", "to_add_out"}


def mmdit_flax_path(module: str) -> tuple[str, ...]:
    """diffusers SD3Transformer2DModel module path -> models/mmdit.py params
    (mirrors convert/mmdit.py port_mmdit)."""
    p = module.split(".")
    if p[0] == "transformer_blocks":
        blk, rest = f"blocks_{p[1]}", p[2:]
        r = ".".join(rest)
        if rest[0] == "attn":
            if r == "attn.to_out.0":
                return (blk, "to_out_0")
            if rest[1] in _MMDIT_ATTN:
                return (blk, rest[1])
        if r == "ff.net.0.proj":
            return (blk, "ff_proj")
        if r == "ff.net.2":
            return (blk, "ff_out")
        if r == "ff_context.net.0.proj":
            return (blk, "ff_context_proj")
        if r == "ff_context.net.2":
            return (blk, "ff_context_out")
        if r == "norm1.linear":
            return (blk, "norm1_linear")
        if r == "norm1_context.linear":
            return (blk, "norm1_context_linear")
    elif module == "context_embedder":
        return ("context_embedder",)
    elif module == "proj_out":
        return ("proj_out",)
    elif module == "norm_out.linear":
        return ("norm_out_linear",)
    raise KeyError(f"unsupported MMDiT LoRA module: {module}")


TRANSLATORS = {TARGET_UNET: unet_flax_path,
               TARGET_TE: clip_flax_path,
               TARGET_TE2: clip_flax_path,
               TARGET_TRANSFORMER: mmdit_flax_path}


# ---------------------------------------------------------------------------
# merging

def _get(tree, path):
    node = tree
    for k in path:
        if k not in node:
            raise KeyError(f"param path {'/'.join(path)} not in tree "
                           f"(missing {k!r})")
        node = node[k]
    return node


def _set(tree, path, value):
    """Copy-on-write set: returns a new tree sharing untouched subtrees."""
    if not path:
        return value
    new = dict(tree)
    new[path[0]] = _set(tree[path[0]], path[1:], value)
    return new


def _oriented_delta(delta: np.ndarray, kernel) -> np.ndarray:
    """torch-layout delta -> the leaf kernel's layout (port-rule mirror:
    Linear (out,in)->(in,out); conv OIHW->HWIO; 1x1-conv-as-linear both
    ways, convert/unet.py:26-40)."""
    if delta.ndim == 2:
        d = delta.T
        if kernel.ndim == 4:  # linear LoRA onto a 1x1-conv param
            d = d[None, None]
    elif delta.ndim == 4:
        if kernel.ndim == 2:  # conv-1x1 LoRA onto a linear param
            d = delta[:, :, 0, 0].T
        else:
            d = delta.transpose(2, 3, 1, 0)
    else:
        raise ValueError(f"bad LoRA delta rank: {delta.shape}")
    if d.shape != kernel.shape:
        raise ValueError(
            f"LoRA delta shape {d.shape} does not match param {kernel.shape}")
    return d


def merge_lora_into_params(params: dict, adapter: LoRAAdapter, target: str,
                           scale: float = 1.0,
                           originals: dict | None = None) -> dict:
    """Return new params with every ``target`` module's kernel merged.

    ``originals`` (optional dict) collects a pristine fp copy of each
    touched kernel keyed by its Flax path — pass the same dict across
    several merges to support exact restore."""
    translate = TRANSLATORS[target]
    for (t, module), mod in sorted(adapter.modules.items()):
        if t != target:
            continue
        path = translate(module) + ("kernel",)
        kernel = _get(params, path)
        if originals is not None and path not in originals:
            originals[path] = np.array(kernel)
        d = _oriented_delta(mod.delta(scale), kernel)
        base = np.asarray(kernel).astype(np.float32)
        merged = (base + d).astype(kernel.dtype)
        params = _set(params, path,
                      merged if isinstance(kernel, np.ndarray)
                      else _like(kernel, merged))
    return params


def _like(ref, arr):
    """Materialize ``arr`` with the same container type as ``ref``
    (jnp arrays go back to device; np stays host)."""
    import jax.numpy as jnp

    return jnp.asarray(arr)
