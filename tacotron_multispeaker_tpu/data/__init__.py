from .feeder import Batch, Feeder, PrefetchIterator, pad_axis, pick_bucket  # noqa: F401
from .preprocess import CORPORA, load_metadata, write_metadata  # noqa: F401
