from .audio_io import decode_audio, write_wav  # noqa: F401
from .dataset import KeyDataset  # noqa: F401
from . import loaders  # noqa: F401
