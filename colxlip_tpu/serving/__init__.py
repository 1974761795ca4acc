"""Serving-path extras: int8 post-training-quantized encoders."""
from .int8 import quantize_vision_params, vision_encode_int8  # noqa: F401
