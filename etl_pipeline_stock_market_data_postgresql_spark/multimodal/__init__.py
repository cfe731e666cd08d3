from . import binary_columns  # noqa: F401
from .binary_columns import (  # noqa: F401
    attach_binary_payload,
    binary_metadata,
    decode_image_real,
    decode_image_stub,
    extract_features_stub,
    frame_sample_stub,
)
