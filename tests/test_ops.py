"""checkasm-style kernel equivalence tests (pattern: tools/checkasm.c).

Random blocks, batched JAX op vs. scalar golden model, exact equality.
"""

import numpy as np
import pytest

import golden_dsp as G
from x264_tpu.ops import dct as jdct
from x264_tpu.ops import quant as jquant
from x264_tpu.ops import predict as jpred
from x264_tpu.ops import pixel as jpix
from x264_tpu import tables

RNG = np.random.default_rng(1234)


def rand_pix(shape):
    return RNG.integers(0, 256, size=shape, dtype=np.int32)


def rand_resid(shape, lo=-255, hi=255):
    return RNG.integers(lo, hi + 1, size=shape, dtype=np.int32)


class TestTransforms:
    def test_dct4x4(self):
        d = rand_resid((64, 4, 4))
        out = np.asarray(jdct.dct4x4(d))
        for i in range(64):
            np.testing.assert_array_equal(out[i], G.dct4x4(d[i]))

    def test_idct4x4(self):
        c = rand_resid((64, 4, 4), -2048, 2047)
        out = np.asarray(jdct.idct4x4(c))
        for i in range(64):
            np.testing.assert_array_equal(out[i], G.idct4x4(c[i]))

    def test_dct_idct_roundtrip_lossless_scale(self):
        # forward then exact dequant-free inverse reproduces residual when
        # coefficients are divided by the orthogonality factor via
        # quant(qp)=trivial; here simply check idct(dct(d)*W) ~ d at qp=0
        # indirectly through the full quant path in test_quant_roundtrip.
        pass

    def test_hadamard4x4(self):
        d = rand_resid((32, 4, 4), -2048, 2047)
        f = np.asarray(jdct.hadamard4x4_fwd(d))
        inv = np.asarray(jdct.hadamard4x4_inv(d))
        for i in range(32):
            np.testing.assert_array_equal(f[i], G.hadamard4x4_fwd(d[i]))
            np.testing.assert_array_equal(inv[i], G.hadamard4x4_inv(d[i]))

    def test_hadamard2x2(self):
        d = rand_resid((32, 2, 2), -2048, 2047)
        out = np.asarray(jdct.hadamard2x2(d))
        for i in range(32):
            np.testing.assert_array_equal(out[i], G.hadamard2x2(d[i]))

    def test_dct8x8(self):
        d = rand_resid((16, 8, 8))
        out = np.asarray(jdct.dct8x8(d))
        for i in range(16):
            np.testing.assert_array_equal(out[i], G.dct8x8(d[i]))

    def test_idct8x8(self):
        c = rand_resid((16, 8, 8), -1024, 1023)
        out = np.asarray(jdct.idct8x8(c))
        for i in range(16):
            np.testing.assert_array_equal(out[i], G.idct8x8(c[i]))


class TestQuant:
    @pytest.mark.parametrize("qp", [0, 10, 26, 40, 51])
    def test_quant4x4(self, qp):
        t = tables.DEFAULT_QUANT
        mf = t.quant4_mf[tables.CQM_4IY, qp]
        bias = t.quant4_bias[tables.CQM_4IY, qp]
        c = rand_resid((32, 16), -3000, 3000)
        out = np.asarray(jquant.quant(
            c, np.asarray(mf, np.int32), np.asarray(bias, np.int32)))
        for i in range(32):
            np.testing.assert_array_equal(out[i], G.quant(c[i], mf, bias))

    @pytest.mark.parametrize("qp", [0, 5, 11, 26, 37, 51])
    def test_dequant4x4(self, qp):
        t = tables.DEFAULT_QUANT
        dmf = t.dequant4_mf[tables.CQM_4IY, qp % 6]
        lv = rand_resid((32, 16), -512, 512)
        out = np.asarray(jquant.dequant(
            lv, np.asarray(dmf, np.int32), qp // 6, 4))
        for i in range(32):
            np.testing.assert_array_equal(out[i], G.dequant(lv[i], dmf, qp, 4))

    @pytest.mark.parametrize("qp", [0, 11, 26, 37, 51])
    def test_dequant8x8(self, qp):
        t = tables.DEFAULT_QUANT
        dmf = t.dequant8_mf[tables.CQM_8IY, qp % 6]
        lv = rand_resid((8, 64), -512, 512)
        out = np.asarray(jquant.dequant(
            lv, np.asarray(dmf, np.int32), qp // 6, 6))
        for i in range(8):
            np.testing.assert_array_equal(out[i], G.dequant(lv[i], dmf, qp, 6))

    @pytest.mark.parametrize("qp", [0, 26, 35, 51])
    def test_dc_paths(self, qp):
        t = tables.DEFAULT_QUANT
        dmf0 = int(t.dequant4_mf[tables.CQM_4IY, qp % 6][0])
        lv = rand_resid((16, 4, 4), -512, 512)
        out = np.asarray(jquant.dequant_4x4_dc(lv, jnp_i32(dmf0), qp // 6))
        for i in range(16):
            np.testing.assert_array_equal(out[i], G.dequant_4x4_dc(lv[i], dmf0, qp))
        lv2 = rand_resid((16, 2, 2), -512, 512)
        out2 = np.asarray(jquant.dequant_2x2_dc(lv2, jnp_i32(dmf0), qp // 6))
        for i in range(16):
            np.testing.assert_array_equal(out2[i], G.dequant_2x2_dc(lv2[i], dmf0, qp))

    def test_quant_dequant_idct_matches_golden_chain(self):
        """Whole residual chain on random blocks at several QPs."""
        t = tables.DEFAULT_QUANT
        for qp in (0, 18, 26, 38, 51):
            mf = t.quant4_mf[tables.CQM_4IY, qp]
            bias = t.quant4_bias[tables.CQM_4IY, qp]
            dmf = t.dequant4_mf[tables.CQM_4IY, qp % 6]
            d = rand_resid((8, 4, 4))
            coef = np.asarray(jdct.dct4x4(d)).reshape(8, 16)
            lv = np.asarray(jquant.quant(
                coef, np.asarray(mf, np.int32), np.asarray(bias, np.int32)))
            deq = np.asarray(jquant.dequant(
                lv, np.asarray(dmf, np.int32), qp // 6, 4)).reshape(8, 4, 4)
            rec = np.asarray(jdct.idct4x4(deq))
            for i in range(8):
                gcoef = G.dct4x4(d[i]).ravel()
                glv = G.quant(gcoef, mf, bias)
                gdeq = G.dequant(glv, dmf, qp, 4).reshape(4, 4)
                grec = G.idct4x4(gdeq)
                np.testing.assert_array_equal(rec[i], grec)


def jnp_i32(x):
    import jax.numpy as jnp
    return jnp.asarray(x, dtype=jnp.int32)


class TestPredict:
    def test_16x16_all_modes(self):
        for trial in range(8):
            top = rand_pix(16)
            left = rand_pix(16)
            tl = int(rand_pix(()))
            for has_top in (False, True):
                for has_left in (False, True):
                    preds = np.asarray(jpred.predict_16x16(
                        top[None], left[None], np.array([tl]),
                        np.array([has_top]), np.array([has_left])))[0]
                    for mode in range(4):
                        g = G.predict_16x16(mode, top, left, tl, has_top, has_left)
                        if g is not None:
                            np.testing.assert_array_equal(
                                preds[mode], g,
                                err_msg=f"16x16 mode {mode} ht={has_top} hl={has_left}")

    def test_8x8c_all_modes(self):
        for trial in range(8):
            top = rand_pix(8)
            left = rand_pix(8)
            tl = int(rand_pix(()))
            for has_top in (False, True):
                for has_left in (False, True):
                    preds = np.asarray(jpred.predict_8x8c(
                        top[None], left[None], np.array([tl]),
                        np.array([has_top]), np.array([has_left])))[0]
                    for mode in range(4):
                        g = G.predict_8x8c(mode, top, left, tl, has_top, has_left)
                        if g is not None:
                            np.testing.assert_array_equal(
                                preds[mode], g,
                                err_msg=f"8x8c mode {mode} ht={has_top} hl={has_left}")


class TestPixel:
    def test_satd_shapes(self):
        for (h, w) in [(16, 16), (16, 8), (8, 16), (8, 8), (8, 4), (4, 8), (4, 4)]:
            a = rand_pix((4, h, w))
            b = rand_pix((4, h, w))
            out = np.asarray(jpix.satd(a, b))
            for i in range(4):
                assert out[i] == G.satd(a[i], b[i]), (h, w)

    def test_sad_ssd(self):
        a = rand_pix((4, 16, 16))
        b = rand_pix((4, 16, 16))
        np.testing.assert_array_equal(
            np.asarray(jpix.sad(a, b)), [G.sad(a[i], b[i]) for i in range(4)])
        np.testing.assert_array_equal(
            np.asarray(jpix.ssd(a, b)), [G.ssd(a[i], b[i]) for i in range(4)])

    def test_var(self):
        p = rand_pix((4, 16, 16))
        out = np.asarray(jpix.var(p, 8))
        for i in range(4):
            s = int(p[i].astype(np.int64).sum())
            sq = int((p[i].astype(np.int64) ** 2).sum())
            assert out[i] == sq - ((s * s) >> 8)


def test_hadamard_ac_matches_scalar_model():
    """ops/pixel.hadamard_ac vs a direct transcription of
    pixel_hadamard_ac (common/pixel.c:306-358) + the HADAMARD_AC
    16x16 composition shifts."""
    import numpy as np
    from x264_tpu.ops import pixel as opix

    def scalar_had_ac8(p):
        h = np.array([[1, 1], [1, -1]])
        h4 = np.kron(h, h)
        h8 = np.kron(h4, h)
        had8 = h8 @ p @ h8
        sum8 = np.abs(had8).sum()
        sum4 = 0
        for by in range(2):
            for bx in range(2):
                b = p[by * 4:by * 4 + 4, bx * 4:bx * 4 + 4]
                sum4 += np.abs(h4 @ b @ h4).sum()
        dc = p.sum()
        return sum4 - dc, sum8 - dc

    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, (3, 16, 16)).astype(np.int64)
    satd_ac, sa8d_ac = opix.hadamard_ac(pix)
    for i in range(3):
        s4 = s8 = 0
        for qy in range(2):
            for qx in range(2):
                a, b = scalar_had_ac8(
                    pix[i, qy * 8:qy * 8 + 8, qx * 8:qx * 8 + 8])
                s4 += a
                s8 += b
        assert int(satd_ac[i]) == s4 >> 1
        assert int(sa8d_ac[i]) == s8 >> 2


def test_ac_energy_model():
    """ac_energy == SATD(pix, 0) - (sum >> 1) (the PIXEL_16x16 psy
    branch of ssd_plane, encoder/rdo.c:122-125)."""
    import numpy as np
    from x264_tpu.ops import pixel as opix
    rng = np.random.default_rng(11)
    pix = rng.integers(0, 256, (4, 16, 16)).astype(np.int64)
    got = np.asarray(opix.ac_energy(pix))
    z = np.zeros_like(pix)
    want = np.asarray(opix.satd(pix, z)) - (pix.sum(axis=(1, 2)) >> 1)
    np.testing.assert_array_equal(got, want)
