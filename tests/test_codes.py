"""Tests for layer L0: QC structures, file formats, codecs.

Mirrors the reference's test strategy (`test_ldpc.py:20,31`,
`ldpc_env.testCompressionRoundrip` at ldpc_env.py:410) plus structural
golden checks on the CCSDS/802.11n tables.
"""

import numpy as np
import pytest

from ldpc_tpu.codes import (QCCode, bits_to_hex, code_hex_name, compress,
                            hex_to_bits, load_code_instance, near_earth_code,
                            near_earth_generator_dense, read_qc_parity,
                            save_code_instance, save_code_json, load_code_json,
                            uncompress, wifi_code, zeroed_circulant_suite)


def toy_code():
    return QCCode(z=7, shifts=(((1, 3), (0,), ()), ((2,), (), (4, 5))),
                  name="toy")


def test_qc_dense_roundtrip():
    code = toy_code()
    h = code.to_dense()
    assert h.shape == (14, 21)
    assert QCCode.from_dense(h, z=7).shifts == code.shifts
    # circulant convention: CN lane i connects VN lane (i + s) % z
    assert h[0, 1] == 1 and h[0, 3] == 1 and h[1, 2] == 1
    assert h[6, 0] == 1  # shift 1 wraps: (6 + 1) % 7 = 0


def test_qc_degrees_and_edges():
    code = toy_code()
    assert code.row_degrees() == [3, 3]
    assert code.col_degrees() == [3, 1, 2]
    assert code.num_block_edges == 6
    dense = code.to_dense()
    assert dense.sum() == code.num_edges


def test_replace_block_is_pure():
    code = toy_code()
    new = code.replace_block(0, 2, (6,))
    assert code.shifts[0][2] == ()
    assert new.shifts[0][2] == (6,)
    bits = np.zeros(7, np.int32)
    bits[2] = 1
    assert new.replace_block(1, 1, bits).shifts[1][1] == (2,)


def test_hex_codec_roundtrip():
    bits = np.array([1, 0, 1, 1, 0, 0, 0, 1], np.int32)
    assert bits_to_hex(bits) == "B1"
    assert np.array_equal(hex_to_bits("B1"), bits)
    assert np.array_equal(hex_to_bits("b1\n"), bits)  # lowercase + junk ok
    rng = np.random.RandomState(3)
    b = rng.randint(0, 2, 64)
    assert np.array_equal(hex_to_bits(bits_to_hex(b)), b)


def test_near_earth_structure():
    code = near_earth_code()
    assert (code.z, code.block_rows, code.block_cols) == (511, 2, 16)
    assert (code.n, code.m, code.k) == (8176, 1022, 7154)
    assert code.row_degrees() == [32, 32]
    assert set(code.col_degrees()) == {4}


def test_near_earth_generator_consistency():
    """Every generator row must be a codeword of the parity code
    (fileHandler.py:234 loads both; the reference never asserts this)."""
    h = near_earth_code().to_dense(np.int8)
    g = near_earth_generator_dense()
    assert g.shape == (7154, 8176)
    # check a random batch of rows to keep it fast
    rng = np.random.RandomState(0)
    rows = rng.choice(7154, 32, replace=False)
    syn = (h.astype(np.int32) @ g[rows].T.astype(np.int32)) % 2
    assert not syn.any()


def test_wifi_structure():
    code = wifi_code(1944, 5 / 6)
    assert (code.z, code.n, code.m) == (81, 1944, 324)
    assert code.k == 1620
    dense = code.to_dense()
    assert dense.shape == (324, 1944)
    assert dense.sum() == code.num_edges


def test_parity_file_reader(tmp_path):
    code = toy_code()
    lines = []
    for row in code.shifts:
        for block in row:
            lines.append(",".join(str(s) for s in block))
    # empty block lines are not representable in the reference format;
    # use a fully-populated toy instead
    full = QCCode(z=7, shifts=(((1, 3), (0,)), ((2,), (4, 5))))
    txt = "\n".join(",".join(map(str, b)) for row in full.shifts for b in row)
    p = tmp_path / "toy.txt"
    p.write_text(txt + "\n")
    parsed = read_qc_parity(p, 2, 2, 7)
    assert parsed.shifts == full.shifts


def test_compress_uncompress_roundtrip_near_earth_shape():
    """1000-roundtrip test of the reference (ldpc_env.py:410-418), shrunk."""
    rng = np.random.RandomState(7)
    for _ in range(20):
        rows = (rng.random((2, 16, 511)) < 0.01).astype(np.int32)
        code = QCCode.from_first_rows(rows)
        obs = compress(code)
        assert obs.shape == (2048,) and obs.dtype == np.uint8
        back = uncompress(obs, 2, 16, 511)
        assert back.shifts == code.shifts


def test_compress_uncompress_wifi_shape():
    code = wifi_code()
    obs = compress(code)
    back = uncompress(obs, code.block_rows, code.block_cols, code.z)
    assert back.shifts == code.shifts


def test_code_json_roundtrip(tmp_path):
    code = toy_code()
    save_code_json(code, tmp_path / "c.json")
    assert load_code_json(tmp_path / "c.json").shifts == code.shifts


def test_save_load_code_instance(tmp_path):
    code = toy_code()
    name = save_code_instance(code, tmp_path, evaluation_time=1.5)
    loaded, payload = load_code_instance(tmp_path / (name + ".npz"))
    assert loaded.shifts == code.shifts
    assert payload["evaluation_time"] == 1.5
    assert name.startswith("7_2_3_")


def test_code_hex_name_deterministic():
    a, b = code_hex_name(near_earth_code()), code_hex_name(near_earth_code())
    assert a == b and len(a) == 32 * len(bits_to_hex(np.zeros(512, np.int32)))


def test_zeroed_circulant_suite():
    """32 perturbations of near-earth (testMatricesGeneratorScript.py:27-34)."""
    suite = list(zeroed_circulant_suite(near_earth_code()))
    assert len(suite) == 32
    mb, nb, variant = suite[5]
    assert variant.shifts[mb][nb] == ()
    assert variant.num_block_edges == near_earth_code().num_block_edges - 2


def test_encoder_produces_codewords():
    """Systematic encode: H . c == 0 and c[:k] == message, decoder recovers
    the message from the noisy word (the reference's G path,
    ldpc.py:409-416, made first-class)."""
    import jax
    from ldpc_tpu.codes import encode
    from ldpc_tpu.ops import decode
    from ldpc_tpu.sim import transmit_codewords

    code = near_earth_code()
    h = code.to_dense(np.int8)
    rng = np.random.RandomState(9)
    msgs = rng.randint(0, 2, (3, code.k))
    cw = np.asarray(encode(code, msgs))
    assert cw.shape == (3, code.n)
    assert np.array_equal(cw[:, :code.k], msgs)
    syn = (h.astype(np.int64) @ cw.T.astype(np.int64)) % 2
    assert not syn.any()
    # transmit + decode at a comfortable SNR: message recovered exactly
    noisy, _, _ = transmit_codewords(jax.random.key(1), cw, 3.6)
    res = decode(code, noisy, max_iters=50)
    assert bool(res.success.all())
    assert np.array_equal(np.asarray(res.hard), cw)


def test_encoder_singular_parity_square_falls_back():
    """A code whose TRAILING parity square is singular still encodes via
    the column-pivoted general encoder (r4) — the reference's G='None'
    path (ldpc.py:409) simply could not encode such codes."""
    import numpy as np
    from ldpc_tpu.codes import encoder_for_code
    # parity block I + P^2 over z=4 squares to zero mod 2 -> singular H2
    singular = QCCode(z=4, shifts=(((0,), (1,), (0, 2)),))
    enc = encoder_for_code(singular)
    h = singular.to_dense(np.int64)
    rng = np.random.RandomState(3)
    msgs = rng.randint(0, 2, size=(5, enc.k_eff))
    cw = np.asarray(enc(msgs))
    assert ((h @ cw.T) % 2 == 0).all()          # valid codewords
    assert np.array_equal(cw[:, enc.info_positions], msgs)


def test_systematic_encoder_rank_deficient_h():
    """Redundant checks (rank-deficient H): k_eff = n - rank, encoded
    words satisfy EVERY row of H (including the dependent ones)."""
    import numpy as np
    from ldpc_tpu.codes.encode import systematic_encoder_from_h
    rng = np.random.RandomState(0)
    base = rng.randint(0, 2, size=(4, 12)).astype(np.uint8)
    h = np.vstack([base, (base[0] ^ base[1])[None]])  # dependent 5th row
    enc = systematic_encoder_from_h(h)
    assert enc.k_eff == 12 - 4                        # rank 4, not 5
    msgs = rng.randint(0, 2, size=(7, enc.k_eff))
    cw = np.asarray(enc(msgs))
    assert ((h.astype(np.int64) @ cw.T) % 2 == 0).all()
    assert np.array_equal(cw[:, enc.info_positions], msgs)


def test_wifi_family_tables_structure():
    """802.11n n=1944 family invariants (IEEE 802.11n-2009 Annex R): all
    four rates present; shifts in [0, 81); parity part = weight-3 first
    column with shifts (1, 0, 1) at (top, middle-ish, bottom) plus a pure
    dual diagonal of 0-shift blocks (the structure that makes the family
    O(n)-encodable)."""
    from ldpc_tpu.codes import wifi_rates
    assert wifi_rates(1944) == [1 / 2, 2 / 3, 3 / 4, 5 / 6]
    for rate, mb in [(1 / 2, 12), (2 / 3, 8), (3 / 4, 6), (5 / 6, 4)]:
        code = wifi_code(1944, rate)
        assert (code.z, code.n, code.block_rows, code.block_cols) == \
            (81, 1944, mb, 24)
        assert code.k == 1944 - mb * 81
        kb = 24 - mb
        for row in code.shifts:
            for blk in row:
                assert all(0 <= s < 81 for s in blk)
        # first parity column: exactly rows {0, middle, mb-1} with
        # shifts (1, 0, 1)
        col = [code.shifts[r][kb] for r in range(mb)]
        hot = [r for r, blk in enumerate(col) if blk]
        assert len(hot) == 3 and hot[0] == 0 and hot[-1] == mb - 1
        assert col[hot[0]] == (1,) and col[hot[1]] == (0,) \
            and col[hot[2]] == (1,)
        # dual diagonal: parity column kb+1+j has 0-shift blocks at rows
        # j and j+1 only
        for j in range(mb - 1):
            for r in range(mb):
                blk = code.shifts[r][kb + 1 + j]
                assert blk == ((0,) if r in (j, j + 1) else ())


@pytest.mark.parametrize("rate", [1 / 2, 2 / 3, 3 / 4, 5 / 6])
def test_wifi_family_encodable(rate):
    """Every 802.11n rate systematically encodes: H . c == 0, message
    preserved (generic GF(2) parity-part derivation, no generator file)."""
    from ldpc_tpu.codes import encoder_for_code
    code = wifi_code(1944, rate)
    enc = encoder_for_code(code)
    rng = np.random.RandomState(3)
    msgs = rng.randint(0, 2, (4, code.k))
    cw = np.asarray(enc(msgs))
    assert np.array_equal(cw[:, :code.k], msgs)
    h = code.to_dense(np.int8)
    syn = (h.astype(np.int64) @ cw.T.astype(np.int64)) % 2
    assert not syn.any()


import os
import re


@pytest.mark.skipif(not os.path.exists("/root/reference/common.py"),
                    reason="reference not mounted")
def test_uncompress_reference_golden_string():
    """Parse the golden compressed observation shipped inside the
    reference (common.py:369, an RL-mutated near-earth variant — NOT
    near-earth itself) and verify our codec decodes it consistently with
    the reference's unpack rule."""
    src = open("/root/reference/common.py").read()
    m = re.search(r"compressedExample = '\[([^']+)\]'", src)
    assert m is not None
    observation = np.asarray(m.group(1).split(), dtype=np.uint8)
    assert observation.shape == (2048,)
    code = uncompress(observation, 2, 16, 511)
    # must be a near-earth-shaped code...
    assert (code.z, code.block_rows, code.block_cols) == (511, 2, 16)
    # ...that differs from near-earth in exactly the blocks the verify
    # notes call out ((0,10) and (1,11) are RL-mutated)
    ne = near_earth_code()
    diffs = [(mb, nb) for mb in range(2) for nb in range(16)
             if code.shifts[mb][nb] != ne.shifts[mb][nb]]
    assert diffs  # mutated, not pristine near-earth
    # and our compress must roundtrip the reference's packing exactly
    assert np.array_equal(compress(code), observation)
