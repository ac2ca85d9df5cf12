"""Model registry (reference: models/__init__.py create_model)."""

from .tacotron import Tacotron, TacotronOutput  # noqa: F401
from .losses import tacotron_loss, priority_bins  # noqa: F401

_MODELS = {"tacotron": Tacotron}


def create_model(name: str, cfg):
    if name not in _MODELS:
        raise ValueError(f"unknown model {name!r}; options: {sorted(_MODELS)}")
    return _MODELS[name](cfg)
