"""Conversion-fidelity metrics (reference torch2coreml.py:59-97)."""

from __future__ import annotations

import logging

import numpy as np

logger = logging.getLogger(__name__)

#: Minimum acceptable parity between the ported and reference models, in dB
#: (reference torch2coreml.py:77).
ABSOLUTE_MIN_PSNR = 35.0


def compute_psnr(a, b) -> float:
    """PSNR in dB between two tensors (reference torch2coreml.py:59-74)."""
    a = np.asarray(a, dtype=np.float64).ravel()
    b = np.asarray(b, dtype=np.float64).ravel()
    max_ab = max(np.abs(a).max(), np.abs(b).max(), 1e-10)
    mse = np.mean((a - b) ** 2)
    return float(20 * np.log10(max_ab / (np.sqrt(mse) + 1e-10)))


def report_correctness(candidate, reference, label: str = "model",
                       min_psnr: float = ABSOLUTE_MIN_PSNR) -> float:
    """Assert the ported model's output parity (torch2coreml.py:80-97)."""
    psnr = compute_psnr(candidate, reference)
    logger.info("%s PSNR vs reference: %.1f dB", label, psnr)
    if psnr < min_psnr:
        raise AssertionError(
            f"{label}: PSNR {psnr:.1f} dB below the {min_psnr} dB gate")
    return psnr
