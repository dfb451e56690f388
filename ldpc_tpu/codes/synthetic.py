"""Synthetic QC-LDPC construction for scale studies.

The reference ships two code families (CCSDS near-earth, 802.11n) whose
codewords fit one device many times over.  The row-sharded decoder
(``parallel/rowshard.py``) exists for GIANT codes — circulant sizes in the
tens of thousands, DVB-S2-scale and beyond — and needs concrete instances
to be demonstrated on.  This builds protograph-style random QC codes of any
size: every block column gets ``col_weight`` distinct block rows (the
classic (wc, wr)-regular construction), each selected block one uniform
shift, so the dense H has column weight exactly ``col_weight`` and row
weight ``block_cols * col_weight / block_rows`` on average.

Girth is whatever the draw gives (no 4-cycle elimination pass) — fine for
decoder scaling/throughput studies, NOT a code-design tool.
"""

from __future__ import annotations

import numpy as np

from .qc import QCCode

__all__ = ["synthetic_qc_code"]


def synthetic_qc_code(z: int, block_rows: int, block_cols: int, *,
                      col_weight: int = 3, seed: int = 0,
                      name: str | None = None) -> QCCode:
    """A random (col_weight)-regular QC-LDPC code of shape
    (block_rows*z, block_cols*z).

    ``col_weight`` must not exceed ``block_rows``.  Block-row loads are
    balanced (each block column's rows are drawn without replacement,
    round-robin seeded) so no check row is empty.
    """
    if col_weight > block_rows:
        raise ValueError(f"col_weight {col_weight} > block_rows "
                         f"{block_rows}")
    rng = np.random.default_rng(seed)
    shifts = [[() for _ in range(block_cols)] for _ in range(block_rows)]
    # balanced row selection: fill a pool with repeated row indices and
    # deal col_weight distinct rows per column from the least-used rows
    load = np.zeros(block_rows, np.int64)
    for c in range(block_cols):
        # pick the col_weight least-loaded rows, breaking ties randomly
        order = np.lexsort((rng.random(block_rows), load))
        rows = order[:col_weight]
        load[rows] += 1
        for r in rows:
            shifts[int(r)][c] = (int(rng.integers(z)),)
    return QCCode(z=z, shifts=tuple(tuple(r) for r in shifts),
                  name=name or f"synthetic_z{z}_{block_rows}x{block_cols}"
                               f"_wc{col_weight}_s{seed}")
