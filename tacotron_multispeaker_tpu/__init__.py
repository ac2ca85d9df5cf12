"""TPU-native multispeaker Tacotron framework.

A from-scratch JAX/XLA/Pallas rebuild with the capabilities of the reference
``Jim-Song/tacotron_multispeaker`` (TF1 Tacotron-1 multispeaker fork — see
SURVEY.md): CBHG encoder, speaker-embedding conditioning, location/content
attention, autoregressive r-frame mel decoder, linear post-net, Griffin-Lim
vocoding, bucketed data feeding — redesigned TPU-first.
"""

__version__ = "0.1.0"

from .config import Config, get_config, PRESETS  # noqa: F401
