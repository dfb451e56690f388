"""Decoder ops: decode plans, batched BP decoders, golden oracle."""

from .plan import DecodePlan
from .decoder import (DecodeResult, decode, decoder_for_code, make_decoder)
from .oracle import dense_min_sum_decode, syndrome_ok

__all__ = [
    "DecodePlan",
    "DecodeResult",
    "decode",
    "decoder_for_code",
    "make_decoder",
    "dense_min_sum_decode",
    "syndrome_ok",
]
