"""Serving-path extras: int8 post-training-quantized encoders."""
from .int8 import (  # noqa: F401
    quantize_text_params,
    quantize_vision_params,
    text_encode_int8,
    vision_encode_int8,
)
