"""End-to-end CLI: stdout parity + byte-exact artifacts vs the C reference.

Runs in-process (main(argv)) on the CPU backend from conftest.
"""
import os

import numpy as np
import pytest

from motionestimation_tpu import cli

from conftest import FixtureCase, REF_FRAMES


def _run(case: FixtureCase, tmp_path, extra=()):
    argv = [
        os.path.join(REF_FRAMES, case.meta["cur"]),
        os.path.join(REF_FRAMES, case.meta["ref"]),
        str(tmp_path),
        str(case.blk_dim),
        str(case.span),
        str(case.width),
        str(case.height),
        "--backend",
        "xla",
        *extra,
    ]
    assert cli.main(argv) == 0
    out = os.path.join(
        str(tmp_path), f"output_{case.blk_dim}_{case.span}.yuv"
    )
    with open(out, "rb") as f:
        return f.read()


def test_cli_mse_byte_exact(tmp_path, capsys):
    case = FixtureCase("foreman_mse_8_12")
    data = _run(case, tmp_path)
    assert data == case.golden_stack.tobytes()
    stdout = capsys.readouterr().out
    assert "PSNR: 31.816000" in stdout
    assert "Output file dimensions: (352 x 1440)" in stdout
    # The reference's final rounded-PSNR line (main.c:178)
    assert "PSNR: 32 " in stdout


def test_cli_ssim_byte_exact(tmp_path, capsys):
    case = FixtureCase("foreman_ssim_16_7")
    data = _run(case, tmp_path, extra=("--metric", "ssim"))
    assert data == case.golden_stack.tobytes()
    stdout = capsys.readouterr().out
    o, c = case.golden_scores()
    assert f"Original Score: {o:.4f}, Compensated Score: {c:.4f}" in stdout


def test_cli_gop_resume(tmp_path):
    f1 = os.path.join(REF_FRAMES, "ForemanYF1.yuv")
    f2 = os.path.join(REF_FRAMES, "ForemanYF2.yuv")
    f4 = os.path.join(REF_FRAMES, "ForemanYF4.yuv")
    argv = [
        f1, f1, str(tmp_path), "16", "7", "352", "288",
        "--backend", "xla", "--gop", f1, f2, f4,
    ]
    assert cli.main(argv) == 0
    dumps = sorted(p for p in os.listdir(tmp_path) if p.endswith(".npz"))
    assert dumps == ["mv_00000.npz", "mv_00001.npz"]
    d0 = np.load(os.path.join(tmp_path, "mv_00000.npz"))
    assert d0["mv_y"].shape == (288 // 16, 352 // 16)
    assert float(d0["psnr"]) > 20.0
    mtimes = {p: os.path.getmtime(os.path.join(tmp_path, p)) for p in dumps}
    # Resume: nothing recomputed when all dumps exist.
    assert cli.main(argv) == 0
    for p in dumps:
        assert os.path.getmtime(os.path.join(tmp_path, p)) == mtimes[p]
