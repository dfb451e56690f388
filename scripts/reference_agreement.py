"""Run the REFERENCE's own decoder (ldpc.py, interpreted) on our inputs.

The ultimate parity adjudication: numba is unavailable here, but the
reference's CPU decoder (`/root/reference/ldpc.py`, per-edge object graph)
is pure Python once `numba` is stubbed with identity decorators — slow
(~1-4 s/word) but exact.  Two studies:

1. **Word-exact agreement**: decode the same raw channel words with the
   reference `ldpcDecoder.decoderMainLoop` (f64), our numpy oracle (f64,
   `ops/oracle.py`) and the XLA f32 decoder; report exact (errors,
   iterations, success) agreement fractions.

2. **Adjudicating the published 3.3076 dB point**: the reference repo's
   plot constant claims BER 1.0794e-2 at realized 3.3076 dB
   (common.py:112-114) while our engines measure ~1.5e-3 ± 0.8e-4 there —
   a gap no Monte-Carlo fluctuation explains.  Decoding a couple hundred
   fresh transmissions with the reference's OWN update rule settles which
   curve its code actually produces.

Appends a "reference_agreement" section to docs/ber_parity.json.

Run (CPU only, no TPU needed):  python scripts/reference_agreement.py
"""

from __future__ import annotations

import json
import os
import sys
import time
import types as pytypes

sys.path.insert(0, "/root/repo")

import numpy as np


def _install_numba_stub():
    """Identity-decorator numba so /root/reference/ldpc.py imports pure."""
    numba = pytypes.ModuleType("numba")

    def jit(*a, **k):
        if len(a) == 1 and callable(a[0]) and not k:
            return a[0]

        def deco(f):
            return f

        return deco

    def jitclass(spec=None):
        if isinstance(spec, type):
            return spec

        def deco(cls):
            return cls

        return deco

    types_mod = pytypes.SimpleNamespace(
        DictType=lambda *a, **k: None,
        ListType=lambda *a, **k: None,
    )

    class _TypedDict(dict):
        @staticmethod
        def empty(*a, **k):
            return {}

    typed_mod = pytypes.SimpleNamespace(Dict=_TypedDict, List=list)

    numba.jit = jit
    numba.njit = jit
    numba.jitclass = jitclass
    numba.types = types_mod
    numba.typed = typed_mod
    # runtime-usable numpy dtypes that also tolerate spec subscripting
    for name, npdt in [("int32", np.int32), ("int64", np.int64),
                       ("float32", np.float32), ("float64", np.float64),
                       ("boolean", np.bool_)]:
        setattr(numba, name, _SubscriptableDtype(npdt))
    sys.modules["numba"] = numba


class _SubscriptableDtype:
    """Wraps a numpy dtype: jitclass-spec subscripting (float64[:])
    returns self; numpy accepts it as a dtype via the ``.dtype``
    attribute protocol; calling casts (LDPC_INT_DATA_TYPE(v))."""

    def __init__(self, npdt):
        self._npdt = np.dtype(npdt)

    def __getitem__(self, _):
        return self

    @property
    def dtype(self):  # np.dtype(obj) attribute protocol
        return self._npdt

    def __call__(self, x):
        return self._npdt.type(x)


def main():
    words_agree = int(os.environ.get("REF_AGREE_WORDS", "32"))
    words_point = int(os.environ.get("REF_POINT_WORDS", "192"))

    _install_numba_stub()
    sys.path.insert(0, "/root/reference")
    # `import ldpc` is impossible: the reference file is corrupted at
    # line 438 (spaces inside an identifier in testCodeUsingMultiprocessing
    # — a SyntaxError).  The decoder classes end before the corruption, so
    # exec the source truncated at the first test function.
    src = open("/root/reference/ldpc.py").read()
    src = src[:src.index("def testModulationAndSlicingRoundTrip")]
    reference_ldpc = pytypes.ModuleType("reference_ldpc")
    reference_ldpc.__file__ = "/root/reference/ldpc.py"
    exec(compile(src, "/root/reference/ldpc.py", "exec"),
         reference_ldpc.__dict__)

    # numpy dtype indirection: the reference creates arrays with
    # dtype=<stub>; numpy coerces via np.dtype(obj.type)... verify early.
    probe = np.ones(3, dtype=np.dtype(np.float64))
    assert probe.dtype == np.float64

    from ldpc_tpu.codes import near_earth_code
    from ldpc_tpu.ops.oracle import dense_min_sum_decode

    code = near_earth_code()
    h = code.to_dense(np.int64)

    def fresh_decoder():
        # One decoder PER WORD: the reference's checkNode.outgoingValues
        # persist across decoderMainLoop calls, so a reused object feeds
        # the previous word's last messages into the next word's first
        # extrinsic subtraction (ldpc.py:161 `value - outgoingValues`).
        # The reference itself reuses one decoder across the SNR points
        # of a transmission (ldpc.py:397,425) — a state-leak bug; the
        # uncontaminated first-decode semantics is the honest contract.
        return reference_ldpc.ldpcDecoder(h)

    rng = np.random.default_rng(20260817)

    def transmit(nwords, snr_db):
        snr = 10.0 ** (snr_db / 10.0)
        sigma = np.sqrt(0.5 / snr)     # addAWGN, ldpc.py:51-60
        noise = rng.normal(0.0, sigma, size=(nwords, code.n))
        return -1.0 + noise            # modulated all-zero codeword

    out = {"words_agreement": words_agree, "words_point": words_point}

    # ---- study 1: word-exact agreement at 3.2 dB ----
    llr = transmit(words_agree, 3.2)
    import jax
    import jax.numpy as jnp
    from ldpc_tpu.ops.decoder import decode
    xla = decode(code, jnp.asarray(llr, jnp.float32), max_iters=50)
    xla_errs = np.asarray(xla.hard).sum(axis=1)
    xla_iters = np.asarray(xla.iterations)
    xla_ok = np.asarray(xla.success)

    agree_oracle = agree_xla = 0
    ref_rows = []
    t0 = time.time()
    for w in range(words_agree):
        status, binary, _, iters = fresh_decoder().decoderMainLoop(llr[w], 50)
        e_ref, ok_ref = int(binary.sum()), status == "Codeword"
        hard_o, _, it_o, ok_o = dense_min_sum_decode(h, llr[w], 50)
        same_o = (int(hard_o.sum()) == e_ref and it_o == iters
                  and ok_o == ok_ref)
        same_x = (int(xla_errs[w]) == e_ref and int(xla_iters[w]) == iters
                  and bool(xla_ok[w]) == ok_ref)
        agree_oracle += same_o
        agree_xla += same_x
        ref_rows.append((e_ref, iters, ok_ref))
        print(f"[agree] word {w}: ref (e={e_ref}, it={iters}, ok={ok_ref}) "
              f"oracle_same={same_o} xla_same={same_x}",
              file=sys.stderr, flush=True)
    out["agreement_snr_db"] = 3.2
    out["oracle_word_exact"] = agree_oracle / words_agree
    out["xla_f32_word_exact"] = agree_xla / words_agree
    out["agreement_seconds"] = time.time() - t0

    # ---- study 2: the published 3.3076 dB point, reference's own rule --
    llr2 = transmit(words_point, 3.3076)
    errs = np.zeros(words_point, np.int64)
    t0 = time.time()
    for w in range(words_point):
        status, binary, _, iters = fresh_decoder().decoderMainLoop(llr2[w], 50)
        errs[w] = int(binary.sum())
        if (w + 1) % 32 == 0:
            print(f"[point] {w + 1}/{words_point} decoded "
                  f"(BER so far {errs[:w + 1].sum() / ((w + 1) * code.n):.4e})",
                  file=sys.stderr, flush=True)
    ber = errs.sum() / (words_point * code.n)
    half = 1.96 * errs.std(ddof=1) / np.sqrt(words_point) / code.n
    out["point_snr_db"] = 3.3076
    out["point_ber"] = float(ber)
    out["point_ber_ci95_half"] = float(half)
    out["point_fer"] = float((errs > 0).mean())
    out["point_seconds"] = time.time() - t0
    out["published_constant"] = 1.0794e-2
    print(f"[point] reference's own decoder @3.3076 dB: BER {ber:.4e} ± "
          f"{half:.1e} (published constant 1.0794e-2; our engines "
          f"~1.5e-3)", file=sys.stderr)

    path = "/root/repo/docs/ber_parity.json"
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["reference_agreement"] = out
    json.dump(data, open(path, "w"), indent=1)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
