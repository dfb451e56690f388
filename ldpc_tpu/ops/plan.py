"""Static decode plans: QC shift tables -> TPU-friendly index structures.

TPU-first design
----------------
The reference decoders walk the Tanner graph with per-edge Python loops
(``ldpc.py:282-311``) or keep a dense ``m x n`` float message matrix per
codeword (``ldpcCUDA.py:538-574``, 1022x8176 fp32 = 33 MB for ONE codeword).
Neither maps to a TPU.  Here a code is compiled once, on the host, into a
*decode plan*: small static integer tables describing the circulant block
structure.  Messages then live as ``[Mb, Dmax, Z, B]`` tensors (batch minor,
so the VPU lanes run across codewords), circulant alignment is a static roll
along the ``Z`` sublane axis, and the check/variable-node updates are masked
reductions over the tiny block-degree axis.  Everything is static-shaped, so
the whole decoder compiles into one XLA ``while_loop``.

Slot layout:
  * CN side: ``cn_nb[mb, d]`` / ``cn_shift[mb, d]`` / ``cn_valid[mb, d]``
    list the (block-col, shift) edges of block row ``mb``, padded to the max
    block-row degree ``Dmax``.  Message slot ``(mb, d)`` holds, in *check
    frame*, the messages of that block edge: lane ``i`` of slot ``(mb, d)``
    belongs to check node ``mb*Z + i`` and variable node
    ``cn_nb*Z + (i + cn_shift) % Z`` (the reference circulant convention,
    ``fileHandler.py:137-142``).
  * VN side: ``vn_slot[nb, dv]`` indexes into the flattened ``Mb*Dmax`` slot
    axis, ``vn_shift[nb, dv]`` is that edge's shift, padded to the max
    block-col degree ``DmaxV``.  Rolling slot ``s`` by ``+shift`` converts it
    to *variable frame* where lane ``j`` belongs to variable node
    ``nb*Z + j``.
"""

from __future__ import annotations

import dataclasses

import numpy as np

from ..codes.qc import QCCode

__all__ = ["DecodePlan"]


@dataclasses.dataclass(frozen=True)
class DecodePlan:
    """Host-compiled static structure of a QC code, consumed by the decoders.

    All arrays are plain numpy (hashable via id for jit static args is not
    needed: the plan is closed over at trace time, producing one compiled
    executable per code structure — the analogue of the reference compiling
    its CUDA kernels per matrix shape, ``ldpcCUDA.py:112-495``, but cached by
    XLA instead of guarded by a process lock).
    """

    z: int
    block_rows: int           # Mb
    block_cols: int           # Nb
    dmax_cn: int              # max block-row degree (near-earth: 32)
    dmax_vn: int              # max block-col degree (near-earth: 4)
    # CN side, shape [Mb, dmax_cn]:
    cn_nb: np.ndarray         # int32 block col of each slot (0 for padding)
    cn_shift: np.ndarray      # int32 circulant shift of each slot
    cn_valid: np.ndarray      # bool
    # VN side, shape [Nb, dmax_vn]:
    vn_slot: np.ndarray       # int32 index into flattened [Mb*dmax_cn] slots
    vn_shift: np.ndarray      # int32 shift of that edge
    vn_valid: np.ndarray      # bool

    @property
    def n(self) -> int:
        return self.block_cols * self.z

    @property
    def m(self) -> int:
        return self.block_rows * self.z

    @property
    def num_slots(self) -> int:
        return self.block_rows * self.dmax_cn

    @staticmethod
    def from_code(code: QCCode) -> "DecodePlan":
        mb_n, nb_n, z = code.block_rows, code.block_cols, code.z
        # CN side: edges of each block row in ascending (block col, shift)
        # order — the same column-major order the reference's checkNode uses
        # for its address book (np.where over a row, ldpc.py:244).
        rows = [
            [(nb, s) for nb, block in enumerate(code.shifts[mb]) for s in block]
            for mb in range(mb_n)
        ]
        dmax = max((len(r) for r in rows), default=0)
        dmax = max(dmax, 1)
        cn_nb = np.zeros((mb_n, dmax), np.int32)
        cn_shift = np.zeros((mb_n, dmax), np.int32)
        cn_valid = np.zeros((mb_n, dmax), bool)
        for mb, r in enumerate(rows):
            for d, (nb, s) in enumerate(r):
                cn_nb[mb, d] = nb
                cn_shift[mb, d] = s
                cn_valid[mb, d] = True

        # VN side: for each block col, the (flat slot, shift) of its edges in
        # ascending block-row order (the reference accumulates CN messages in
        # ascending check index, ldpc.py:298-303).
        cols: list[list[tuple[int, int]]] = [[] for _ in range(nb_n)]
        for mb, r in enumerate(rows):
            for d, (nb, s) in enumerate(r):
                cols[nb].append((mb * dmax + d, s))
        dmax_v = max((len(c) for c in cols), default=0)
        dmax_v = max(dmax_v, 1)
        vn_slot = np.zeros((nb_n, dmax_v), np.int32)
        vn_shift = np.zeros((nb_n, dmax_v), np.int32)
        vn_valid = np.zeros((nb_n, dmax_v), bool)
        for nb, c in enumerate(cols):
            for dv, (slot, s) in enumerate(c):
                vn_slot[nb, dv] = slot
                vn_shift[nb, dv] = s
                vn_valid[nb, dv] = True

        return DecodePlan(
            z=z, block_rows=mb_n, block_cols=nb_n,
            dmax_cn=dmax, dmax_vn=dmax_v,
            cn_nb=cn_nb, cn_shift=cn_shift, cn_valid=cn_valid,
            vn_slot=vn_slot, vn_shift=vn_shift, vn_valid=vn_valid,
        )

    def cache_key(self) -> tuple:
        """Hashable structural identity (for memoising jitted decoders)."""
        return (
            self.z, self.block_rows, self.block_cols, self.dmax_cn,
            self.dmax_vn,
            self.cn_nb.tobytes(), self.cn_shift.tobytes(),
            self.cn_valid.tobytes(), self.vn_slot.tobytes(),
            self.vn_shift.tobytes(), self.vn_valid.tobytes(),
        )
