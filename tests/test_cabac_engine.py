"""CABAC engine unit fuzz: the native C engine and the Python twin must
emit byte-identical output for random op streams of every kind, and the
spec decoder (refdec's CabacDecoder) must read back every decision /
bypass / ue / sigmap / level value that went in."""

import numpy as np
import pytest

from x264_tpu import native
from x264_tpu.entropy import cabac as EC
from x264_tpu.entropy import cabac_tables as CT


def _random_ops(rng, n):
    """Random op stream exercising all kinds (kind 4 pads included)."""
    ops = []
    for _ in range(n):
        k = rng.choice([0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 7, 7])
        if k == 0:
            ops.append(EC.pack_op(0, int(rng.integers(0, 460)),
                                  int(rng.integers(0, 2))))
        elif k == 1:
            nb = int(rng.integers(1, 13))
            ops.append(EC.pack_op(1, int(rng.integers(0, 1 << nb)), nb))
        elif k == 2:
            ops.append(EC.pack_op(2, int(rng.integers(0, 1 << 16)),
                                  int(rng.integers(0, 4))))
        elif k == 3:
            ops.append(EC.pack_op(3, 0, 0))
        elif k == 4:
            ops.append(EC.pack_op(4, 0, 0))
        elif k == 5:
            ops.append(EC.pack_op(5, int(rng.integers(0, 460)),
                                  int(rng.integers(1, 14))))
        elif k == 6:
            cat = int(rng.integers(0, 5))
            C = EC.CAT_C[cat]
            mask = int(rng.integers(0, 1 << (C - 1)))
            # last must be >= the highest set mask bit and < C
            hi = mask.bit_length()  # bits below `last` only
            last = int(rng.integers(max(hi, 0), C)) if mask \
                else int(rng.integers(0, C))
            ops.append(EC.pack_op(6, mask, cat | (last << 3)))
            # follow with a coherent number of levels
            nlev = bin(mask).count("1") + 1
            for _ in range(nlev):
                ops.append(EC.pack_op(
                    7, int(rng.integers(0, 40)), int(rng.integers(0, 2))))
        elif k == 7:
            ops.append(EC.pack_op(7, int(rng.integers(0, 1 << 17)),
                                  int(rng.integers(0, 2))))
    return np.asarray(ops, np.uint32)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_c_engine_matches_python_twin(seed):
    if native.load() is None:
        pytest.skip("no C toolchain")
    rng = np.random.default_rng(seed)
    ops = _random_ops(rng, 4000)
    st_c = CT.init_states(False, 26, 0)
    st_py = st_c.copy()

    payload_c, fix_c = EC.encode_ops(st_c, ops, 0x55)

    enc = EC.PyCabacEncoder(st_py, 0x55)
    for op in ops:
        op = int(op)
        k, b, a = op >> 29, (op >> 17) & EC.B_MAX, op & EC.A_MAX
        if k == 0:
            enc.decision(a, b & 1)
        elif k == 1:
            for j in range(b - 1, -1, -1):
                enc.bypass((a >> j) & 1)
        elif k == 2:
            enc.ue_bypass(a, b)
        elif k == 3:
            enc.terminal0()
        elif k == 5:
            for _ in range(b):
                enc.decision(a, 1)
        elif k == 6:
            enc.sigmap(a, b & 7, b >> 3)
        elif k == 7:
            enc.level(a, b & 1)
    enc.flush()
    assert fix_c == 0x55          # spec engine never carries into header
    assert enc.out[0] == 0x55
    assert payload_c == bytes(enc.out[1:])
    np.testing.assert_array_equal(st_c, st_py)


def test_decision_bypass_roundtrip():
    """Encode random decisions/bypasses/ue, decode with the spec
    decoder, require every bin back."""
    rng = np.random.default_rng(7)
    n = 3000
    ctxs = rng.integers(0, 460, n)
    bins = rng.integers(0, 2, n)
    kinds = rng.integers(0, 3, n)          # 0 decision, 1 bypass, 2 ue
    ues = rng.integers(0, 300, n)
    st = CT.init_states(True, 30, 0)
    st0 = st.copy()
    enc = EC.PyCabacEncoder(st, 0)
    for i in range(n):
        if kinds[i] == 0:
            enc.decision(int(ctxs[i]), int(bins[i]))
        elif kinds[i] == 1:
            enc.bypass(int(bins[i]))
        else:
            enc.ue_bypass(int(ues[i]), 0)
    enc.flush()
    data = bytes(enc.out[1:])

    dec = EC.CabacDecoder(data, st0)
    for i in range(n):
        if kinds[i] == 0:
            assert dec.decision(int(ctxs[i])) == bins[i], i
        elif kinds[i] == 1:
            assert dec.bypass() == bins[i], i
        else:
            assert dec.ue_bypass(0) == ues[i], i
    assert dec.terminal() == 1             # the flush's terminate(1)


def test_hw_pack_roundtrip():
    """Device halfword transfer format (cabac_planes.hw_pack) must
    round-trip every op kind through the host unpack (unpack_hw)."""
    import jax.numpy as jnp
    from x264_tpu.entropy import cabac_planes as CP

    rng = np.random.default_rng(11)
    ops = np.asarray(_random_ops(rng, 5000), np.uint32)
    want = ops[(ops >> 29) != CP.KIND_PAD]
    cap = len(ops) + 64
    cops, n = CP.compact_ops(jnp.asarray(ops), cap)
    words, n_hw = CP.hw_pack(cops, n, 3 * cap)
    got = EC.unpack_hw(np.asarray(words), int(n_hw))
    np.testing.assert_array_equal(got, want)


def test_hw_pack_extreme_fields():
    """Ops with maxed a/b fields take the 3-halfword extended form and
    still round-trip exactly."""
    import jax.numpy as jnp
    from x264_tpu.entropy import cabac_planes as CP

    ops = np.asarray([
        EC.pack_op(7, 0x1FFFF, 1),        # huge |level|-1
        EC.pack_op(6, 0xFFFF, 5 | (62 << 3) | (3 << 9)),  # cat5 part 3
        EC.pack_op(5, 459, 0xFFF),        # max ones run
        EC.pack_op(2, 0x1FFFF, 3),        # big ue value
        EC.pack_op(0, 459, 1),            # compact decision
        EC.pack_op(3, 0, 0),              # terminal
    ], np.uint32)
    cops, n = CP.compact_ops(jnp.asarray(ops), 16)
    words, n_hw = CP.hw_pack(cops, n, 48)
    got = EC.unpack_hw(np.asarray(words), int(n_hw))
    np.testing.assert_array_equal(got, ops)
