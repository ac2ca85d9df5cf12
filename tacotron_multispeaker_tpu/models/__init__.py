"""Model registry (reference: models/__init__.py create_model)."""

from .tacotron import Tacotron, TacotronOutput  # noqa: F401
from .losses import tacotron_loss, priority_bins  # noqa: F401

_MODELS = {"tacotron": Tacotron}


def create_model(name: str, cfg, *, seq_mesh=None, bn_axis=None):
    """``seq_mesh``: a jax Mesh enabling sequence-sharded attention — the
    encoder memory/keys/mask shard along L over the mesh's model axis and
    the per-step attention runs the distributed softmax of
    ops/sharded_attention.py (SURVEY.md §2.14 SP analogue).  ``bn_axis``:
    mapped-axis name for cross-replica BatchNorm statistics (only valid
    inside shard_map — training.py's data-parallel step).  Parameter
    structure is unchanged either way, so checkpoints load into any
    variant."""
    if name not in _MODELS:
        raise ValueError(f"unknown model {name!r}; options: {sorted(_MODELS)}")
    return _MODELS[name](cfg, seq_mesh=seq_mesh, bn_axis=bn_axis)
