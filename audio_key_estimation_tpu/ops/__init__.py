from .equivariant import (  # noqa: F401
    wrap_pitch_classes,
    equivariant_pc_conv,
    circular_conv2d,
    semitone_pool_conv,
    third_upsample,
    pc_to_pitch_tile,
    pc_to_pitch_memory_add,
)
from .pooling import (  # noqa: F401
    octave_max_pool,
    octave_dilated_conv,
    time_max_pool,
)
from .masked_pool import actual_output_length, masked_time_reduce  # noqa: F401
