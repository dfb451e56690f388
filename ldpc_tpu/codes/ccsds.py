"""CCSDS 131.1-O near-earth (8176, 7154) QC-LDPC code.

The parity structure is the public CCSDS near-earth code (2 x 16 grid of
511 x 511 circulants, each of weight 2; see CCSDS 131.1-O-2 / the reference's
``codeMatrices/nearEarthParity.txt`` parsed by ``fileHandler.py:144``).  Here
it ships as a JSON shift table (``ldpc_tpu/data/ccsds_near_earth.json``) plus
the systematic generator's circulant hex rows
(``ldpc_tpu/data/ccsds_near_earth_generator.json``, cf.
``codeMatrices/nearEarthGenerator.txt``).
"""

from __future__ import annotations

import functools
import json
import pathlib

import numpy as np

from .io import hex_to_bits, load_code_json
from .qc import QCCode

__all__ = ["near_earth_code", "near_earth_generator_rows",
           "near_earth_generator_dense", "Z", "BLOCK_ROWS", "BLOCK_COLS",
           "N", "K", "M"]

_DATA = pathlib.Path(__file__).resolve().parent.parent / "data"

Z = 511
BLOCK_ROWS = 2
BLOCK_COLS = 16
N = BLOCK_COLS * Z      # 8176
M = BLOCK_ROWS * Z      # 1022
K = 7154                # CCSDS message size (n - m = 7154)


@functools.lru_cache(maxsize=1)
def near_earth_code() -> QCCode:
    """The (8176, 7154) near-earth parity-check code as a QCCode."""
    return load_code_json(_DATA / "ccsds_near_earth.json")


@functools.lru_cache(maxsize=1)
def near_earth_generator_rows() -> np.ndarray:
    """[14, 2, 511] circulant first rows of the dense part A of G = [I | A].

    Parsed from 128-char hex lines (512 bits; the leading pad bit is dropped,
    matching ``fileHandler.hexToCirculant``, fileHandler.py:126-135).
    """
    doc = json.loads((_DATA / "ccsds_near_earth_generator.json").read_text())
    z = doc["z"]
    pad = (4 - z % 4) % 4
    lines = doc["hex_rows"]
    kb = len(lines) // 2
    out = np.zeros((kb, 2, z), dtype=np.int32)
    for i in range(kb):
        for j in range(2):
            bits = hex_to_bits(lines[2 * i + j])
            out[i, j] = bits[pad:]
    return out


def near_earth_generator_dense(dtype=np.int8) -> np.ndarray:
    """Dense systematic generator G = [I_7154 | A], shape (7154, 8176).

    Equivalent to ``fileHandler.readMatrixFromFile(..., isGenerator=True)``
    (fileHandler.py:151-160).
    """
    rows = near_earth_generator_rows()
    kb, _, z = rows.shape
    a = np.zeros((K, N - K), dtype=dtype)
    ii = np.arange(z)
    for bi in range(kb):
        for bj in range(2):
            for s in np.flatnonzero(rows[bi, bj]):
                a[bi * z + ii, bj * z + (ii + s) % z] = 1
    g = np.zeros((K, N), dtype=dtype)
    g[:, :K] = np.eye(K, dtype=dtype)
    g[:, K:] = a
    return g
