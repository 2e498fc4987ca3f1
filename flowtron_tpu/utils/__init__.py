from flowtron_tpu.utils.masks import (  # noqa: F401
    sequence_mask,
    flip_within_length_indices,
)
