"""Code construction & matrix I/O (layer L0 of the framework).

Covers the reference's ``fileHandler.py`` / ``wifiMatrices.py`` /
``common.uncompress`` capabilities with a QC-first representation.
"""

from .qc import QCCode, edges_by_block_col, edges_by_block_row
from .io import (bits_to_hex, code_hex_name, hex_to_bits, load_code_instance,
                 load_code_json, read_dense_generator, read_qc_generator_rows,
                 read_qc_parity, save_code_instance, save_code_json)
from .ccsds import (near_earth_code, near_earth_generator_dense,
                    near_earth_generator_rows)
from .wifi import (WIFI_1944_81_RATE_1_2, WIFI_1944_81_RATE_2_3,
                   WIFI_1944_81_RATE_3_4, WIFI_1944_81_RATE_5_6,
                   from_prototype, wifi_code, wifi_rates)
from .codec import compress, observation_bytes, uncompress
from .perturb import zero_circulant, zeroed_circulant_suite, write_suite
from .encode import (encode, encoder_for_code, make_encoder,
                     systematic_encoder_from_h,
                     parity_part_from_h)
from .synthetic import synthetic_qc_code

__all__ = [
    "QCCode", "edges_by_block_col", "edges_by_block_row",
    "bits_to_hex", "hex_to_bits", "code_hex_name",
    "read_qc_parity", "read_qc_generator_rows", "read_dense_generator",
    "load_code_json", "save_code_json", "save_code_instance",
    "load_code_instance",
    "near_earth_code", "near_earth_generator_rows",
    "near_earth_generator_dense",
    "WIFI_1944_81_RATE_1_2", "WIFI_1944_81_RATE_2_3",
    "WIFI_1944_81_RATE_3_4", "WIFI_1944_81_RATE_5_6",
    "from_prototype", "wifi_code", "wifi_rates",
    "compress", "uncompress", "observation_bytes",
    "zero_circulant", "zeroed_circulant_suite", "write_suite",
    "encode", "encoder_for_code", "make_encoder", "parity_part_from_h",
    "systematic_encoder_from_h",
    "synthetic_qc_code",
]
