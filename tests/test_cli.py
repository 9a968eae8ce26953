"""CLI front-end tests (x264.c analogue): option plumbing, container
dispatch, qpfile/zones/dump-yuv flows through the real main()."""

import os

import numpy as np
import pytest

from x264_tpu import cli

W, H, N = 64, 48, 6


@pytest.fixture(scope="module")
def y4m(tmp_path_factory):
    path = tmp_path_factory.mktemp("cli") / "in.y4m"
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:H, 0:W]
    base = (128 + 60 * np.sin(yy / 7.0) + 40 * np.cos(xx / 9.0)
            + rng.normal(0, 5, (H, W))).clip(0, 255).astype(np.uint8)
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{W} H{H} F25:1 Ip A1:1 C420\n".encode())
        for t in range(N):
            f.write(b"FRAME\n")
            f.write(np.roll(base, 2 * t, axis=1).tobytes())
            f.write(np.full((H // 2, W // 2), 120, np.uint8).tobytes())
            f.write(np.full((H // 2, W // 2), 130, np.uint8).tobytes())
    return str(path)


def test_cli_raw_annexb(y4m, tmp_path):
    out = str(tmp_path / "out.264")
    rc = cli.main([y4m, "-o", out, "--qp", "30", "--quiet"])
    assert rc == 0
    data = open(out, "rb").read()
    assert data.startswith(b"\x00\x00\x00\x01")
    # stream must decode via the reference decoder
    from refdec.decoder import Decoder
    from refdec.bits import split_annexb
    dec = Decoder()
    for nal in split_annexb(data):
        dec.decode_nal(nal)
    assert len(dec.frames) == N


def test_cli_mkv_bframes_dump(y4m, tmp_path):
    out = str(tmp_path / "out.mkv")
    dump = str(tmp_path / "rec.y4m")
    rc = cli.main([y4m, "-o", out, "--qp", "30", "-b", "1",
                   "--dump-yuv", dump, "--quiet"])
    assert rc == 0
    data = open(out, "rb").read()
    assert data[:4] == b"\x1a\x45\xdf\xa3"      # EBML magic
    assert b"V_MPEG4/ISO/AVC" in data
    # dump-yuv is display-ordered and frame-complete
    hdr = open(dump, "rb").readline()
    assert hdr.startswith(b"YUV4MPEG2")
    body = open(dump, "rb").read()
    assert body.count(b"FRAME\n") == N


def test_cli_qpfile_and_zones(y4m, tmp_path):
    out = str(tmp_path / "out.264")
    qpf = tmp_path / "qp.txt"
    qpf.write_text("2 K 36\n")                  # force IDR at frame 2
    rc = cli.main([y4m, "-o", out, "--crf", "30",
                   "--qpfile", str(qpf),
                   "--zones", "4,5,q=40", "--quiet"])
    assert rc == 0
    from refdec.bits import split_annexb
    data = open(out, "rb").read()
    idrs = [n for n in split_annexb(data) if (n[0] & 0x1F) == 5]
    assert len(idrs) == 2                       # frame 0 + forced frame 2


def test_cli_two_pass(y4m, tmp_path):
    out = str(tmp_path / "out.264")
    stats = str(tmp_path / "2p.log")
    assert cli.main([y4m, "-o", out, "-B", "300", "-p", "1",
                     "--stats", stats, "--quiet"]) == 0
    assert os.path.exists(stats)
    assert cli.main([y4m, "-o", out, "-B", "300", "-p", "2",
                     "--stats", stats, "--quiet"]) == 0
