from .report import compute_psnr, report_correctness, ABSOLUTE_MIN_PSNR
from .clip import port_clip_text_encoder

__all__ = [
    "compute_psnr",
    "report_correctness",
    "ABSOLUTE_MIN_PSNR",
    "port_clip_text_encoder",
]
