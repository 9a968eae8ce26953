"""Device wavefront deblock vs. the golden scalar model (checkasm-style,
tools/checkasm.c check_deblock analogue)."""

import numpy as np
import pytest

import golden_deblock as GD
from x264_tpu.ops import deblock as OD


def _smooth_frame(rng, h, w, amp):
    """Blocky-plus-noise content so the |p0-q0|<alpha gates are exercised
    both ways."""
    base = rng.integers(0, 256, (h // 8 + 1, w // 8 + 1))
    up = np.repeat(np.repeat(base, 8, 0), 8, 1)[:h, :w]
    noise = rng.integers(-amp, amp + 1, (h, w))
    return np.clip(up + noise, 0, 255).astype(np.int32)


def _run_device(y, u, v, qp_mb, intra_mb, nnz4, ref4, mv4,
                alpha_off=0, beta_off=0, cqp_off=0, is_b=False,
                ref4_l1=None, mv4_l1=None):
    mb_h, mb_w = qp_mb.shape
    z4 = np.zeros((mb_h * 4, mb_w * 4), np.int32)
    zmv = np.zeros((mb_h * 4, mb_w * 4, 2), np.int32)
    dy, du, dv = OD.deblock_frame(
        mb_h, mb_w, y, u, v, qp_mb, intra_mb, nnz4, ref4, mv4,
        z4 if ref4_l1 is None else ref4_l1,
        zmv if mv4_l1 is None else mv4_l1,
        is_b, alpha_off, beta_off, cqp_off)
    return np.asarray(dy), np.asarray(du), np.asarray(dv)


def _case(rng, mb_h, mb_w, qp_lo, qp_hi, intra_frac, amp=6,
          alpha_off=0, beta_off=0, cqp_off=0, is_b=False):
    h, w = mb_h * 16, mb_w * 16
    y = _smooth_frame(rng, h, w, amp)
    u = _smooth_frame(rng, h // 2, w // 2, amp)
    v = _smooth_frame(rng, h // 2, w // 2, amp)
    qp_mb = rng.integers(qp_lo, qp_hi + 1, (mb_h, mb_w)).astype(np.int32)
    intra_mb = rng.random((mb_h, mb_w)) < intra_frac
    nnz4 = (rng.random((mb_h * 4, mb_w * 4)) < 0.3).astype(np.int32)
    ref4 = rng.integers(0, 2, (mb_h * 4, mb_w * 4)).astype(np.int32)
    # MVs in clusters so bS=0 (identical) and bS=1 (differing) both occur
    mv4 = (rng.integers(0, 3, (mb_h * 4, mb_w * 4, 2)) * 4 - 4).astype(np.int32)
    ref4_l1 = rng.integers(0, 2, (mb_h * 4, mb_w * 4)).astype(np.int32)
    mv4_l1 = (rng.integers(0, 3, (mb_h * 4, mb_w * 4, 2)) * 4 - 4).astype(np.int32)

    gy, gu, gv = GD.deblock_frame(
        y.copy(), u.copy(), v.copy(), qp_mb, intra_mb, nnz4, ref4, mv4,
        ref4_l1 if is_b else None, mv4_l1 if is_b else None,
        alpha_off=alpha_off, beta_off=beta_off, chroma_qp_offset=cqp_off)
    dy, du, dv = _run_device(y, u, v, qp_mb, intra_mb, nnz4, ref4, mv4,
                             alpha_off, beta_off, cqp_off, is_b,
                             ref4_l1, mv4_l1)
    np.testing.assert_array_equal(dy, gy)
    np.testing.assert_array_equal(du, gu)
    np.testing.assert_array_equal(dv, gv)


@pytest.mark.parametrize("qp_lo,qp_hi", [(0, 0), (24, 32), (51, 51)])
def test_deblock_all_intra(qp_lo, qp_hi):
    rng = np.random.default_rng(7 + qp_hi)
    _case(rng, 5, 7, qp_lo, qp_hi, intra_frac=1.0)


def test_deblock_mixed_metadata():
    # exercises bS 0/1/2 paths ahead of the inter milestone
    rng = np.random.default_rng(11)
    _case(rng, 4, 9, 20, 40, intra_frac=0.3)


def test_deblock_b_list1():
    rng = np.random.default_rng(13)
    _case(rng, 3, 5, 28, 36, intra_frac=0.2, is_b=True)


def test_deblock_offsets():
    rng = np.random.default_rng(17)
    _case(rng, 3, 4, 10, 45, intra_frac=0.5, alpha_off=4, beta_off=-4,
          cqp_off=2)


def test_deblock_tiny_and_tall():
    rng = np.random.default_rng(19)
    _case(rng, 1, 1, 30, 30, intra_frac=1.0)
    _case(rng, 8, 2, 25, 35, intra_frac=0.5)
