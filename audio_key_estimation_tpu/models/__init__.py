from .pitchclassnet import PitchClassNet  # noqa: F401
from .multi_scale import PitchClassNetMulti  # noqa: F401
from .schedule import layer_channels, head_in_channels  # noqa: F401
