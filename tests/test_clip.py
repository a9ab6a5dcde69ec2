"""CLIP text encoder parity vs transformers' torch implementation.

The reference's conversion requires >=35 dB PSNR per converted module
(torch2coreml.py:77,91-92); we apply the same gate between our Flax encoder
(with ported weights) and a randomly initialized torch CLIPTextModel.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from ml_stable_diffusion_tpu.convert import (
    compute_psnr,
    port_clip_text_encoder,
    report_correctness,
)
from ml_stable_diffusion_tpu.models import CLIPTextConfig, CLIPTextEncoder

TINY = dict(vocab_size=1000, hidden_size=64, intermediate_size=128,
            num_hidden_layers=3, num_attention_heads=4,
            max_position_embeddings=77, eos_token_id=999)


def _torch_model(act="gelu", with_projection=False, projection_dim=48):
    cfg = transformers.CLIPTextConfig(
        vocab_size=TINY["vocab_size"], hidden_size=TINY["hidden_size"],
        intermediate_size=TINY["intermediate_size"],
        num_hidden_layers=TINY["num_hidden_layers"],
        num_attention_heads=TINY["num_attention_heads"],
        max_position_embeddings=77, hidden_act=act,
        eos_token_id=TINY["eos_token_id"], bos_token_id=998,
        projection_dim=projection_dim,
    )
    torch.manual_seed(0)
    cls = (transformers.CLIPTextModelWithProjection if with_projection
           else transformers.CLIPTextModel)
    return cls(cfg).eval()


def _input_ids():
    rng = np.random.RandomState(42)
    ids = rng.randint(1, 900, size=(2, 77)).astype(np.int64)
    ids[:, 0] = 998
    ids[0, 9] = TINY["eos_token_id"]
    ids[0, 10:] = TINY["eos_token_id"]
    ids[1, 30:] = TINY["eos_token_id"]
    return ids


@pytest.mark.parametrize("act", ["gelu", "quick_gelu"])
def test_clip_parity(act):
    tm = _torch_model(act)
    cfg = CLIPTextConfig(**TINY, hidden_act=act)
    params = port_clip_text_encoder(tm.state_dict(), cfg)
    model = CLIPTextEncoder(cfg)

    ids = _input_ids()
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids), output_hidden_states=True)
    out = model.apply({"params": params}, jnp.asarray(ids))

    report_correctness(out["last_hidden_state"], ref.last_hidden_state.numpy(),
                       "clip.last_hidden_state")
    report_correctness(out["pooled_output"], ref.pooler_output.numpy(),
                       "clip.pooled_output")
    # penultimate tap parity (SDXL path): transformers hidden_states[-2]
    report_correctness(out["penultimate_hidden_state"],
                       ref.hidden_states[-2].numpy(), "clip.penultimate")


def test_clip_parity_structured_weights():
    """Structured (distinct-mean + ramp) weights: catches cross-wired or
    transposed ports that random N(0,0.02) weights can mask."""
    from helpers import structure_torch_module

    tm = structure_torch_module(_torch_model("quick_gelu"))
    cfg = CLIPTextConfig(**TINY, hidden_act="quick_gelu")
    params = port_clip_text_encoder(tm.state_dict(), cfg)
    model = CLIPTextEncoder(cfg)

    ids = _input_ids()
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids), output_hidden_states=True)
    out = model.apply({"params": params}, jnp.asarray(ids))
    report_correctness(out["last_hidden_state"], ref.last_hidden_state.numpy(),
                       "clip.structured.last_hidden_state")
    report_correctness(out["penultimate_hidden_state"],
                       ref.hidden_states[-2].numpy(), "clip.structured.penult")


def test_clip_projection_parity():
    tm = _torch_model(with_projection=True, projection_dim=48)
    cfg = CLIPTextConfig(**TINY, use_text_projection=True, projection_dim=48)
    params = port_clip_text_encoder(tm.state_dict(), cfg)
    model = CLIPTextEncoder(cfg)

    ids = _input_ids()
    with torch.no_grad():
        ref = tm(input_ids=torch.from_numpy(ids))
    out = model.apply({"params": params}, jnp.asarray(ids))
    report_correctness(out["pooled_output"], ref.text_embeds.numpy(),
                       "clip.text_embeds")


def test_psnr_metric():
    a = np.random.RandomState(0).randn(100)
    assert compute_psnr(a, a) > 100
    assert compute_psnr(a, a + 1.0) < 12
