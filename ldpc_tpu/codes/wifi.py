"""IEEE 802.11n QC-LDPC codes (n = 1944, Z = 81).

The reference ships the rate-5/6 prototype table (``wifiMatrices.py:6-9``)
and expands it densely (``getWifiParityMatrix``, ``wifiMatrices.py:12-34``).
Here prototype tables map straight to ``QCCode`` shift tables — each entry is
a single circulant shift, ``None`` is the all-zero block — so the decoder
consumes them without ever densifying.
"""

from __future__ import annotations

import functools

from .qc import QCCode

__all__ = ["WIFI_1944_81_RATE_5_6", "wifi_code", "from_prototype"]

# Rate 5/6, n=1944, Z=81: a 4 x 24 prototype of single shifts
# (same public 802.11n table as the reference's WIFI_1944_81_5_6).
_ = None
WIFI_1944_81_RATE_5_6 = [
    [13, 48, 80, 66, 4, 74, 7, 30, 76, 52, 37, 60, _, 49, 73, 31, 74, 73, 23, _, 1, 0, _, _],
    [69, 63, 74, 56, 64, 77, 57, 65, 6, 16, 51, _, 64, _, 68, 9, 48, 62, 54, 27, _, 0, 0, _],
    [51, 15, 0, 80, 24, 25, 42, 54, 44, 71, 71, 9, 67, 35, _, 58, _, 29, _, 53, 0, _, 0, 0],
    [16, 29, 36, 41, 44, 56, 59, 37, 50, 24, _, 65, 4, 65, 52, _, 4, _, 73, 52, 1, _, _, 0],
]

_TABLES = {
    (1944, 5 / 6): (WIFI_1944_81_RATE_5_6, 81),
}


def from_prototype(table, z: int, name: str = "",
                   message_size: int | None = None) -> QCCode:
    """Prototype table (entries: shift int or None) -> QCCode."""
    shifts = tuple(
        tuple(() if e is None else (int(e),) for e in row) for row in table
    )
    return QCCode(z=z, shifts=shifts, name=name, message_size=message_size)


@functools.lru_cache(maxsize=None)
def wifi_code(codeword_size: int = 1944, rate: float = 5 / 6) -> QCCode:
    """The 802.11n code for (codeword_size, rate); rate-5/6 n=1944 today.

    Same entry point shape as ``wifiMatrices.getWifiParityMatrix``
    (wifiMatrices.py:12) but returns the QC structure.
    """
    key = (codeword_size, rate)
    if key not in _TABLES:
        raise ValueError(f"no 802.11n table for n={codeword_size}, rate={rate}; "
                         f"available: {sorted(_TABLES)}")
    table, z = _TABLES[key]
    mb = len(table)
    return from_prototype(table, z, name=f"wifi_{codeword_size}_r{rate:.3f}",
                          message_size=codeword_size - mb * z)
