"""Pallas TPU kernels with XLA fallbacks (SURVEY.md §2.13).

Each hot op exists twice: a hand-written Pallas kernel tuned to MXU/VPU
tiles and a pure-XLA reference with identical math.  ``use_pallas`` config
(parallel.use_pallas) flag-gates them; tests assert allclose between both
paths in interpret mode on CPU and compiled on TPU.
"""

from .conv_bank import conv_bank_pallas, conv_bank_reference  # noqa: F401
from .attention_step import (attention_step_pallas,  # noqa: F401
                             attention_step_reference)
from .overlap_add import overlap_add_pallas, overlap_add_reference  # noqa: F401
from .gru_scan import gru_scan_pallas, gru_scan_reference  # noqa: F401
