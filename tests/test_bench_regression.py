"""Regression harness: reference epsilon semantics (run.sh:74-96)."""
import numpy as np

from motionestimation_tpu.bench import regression as reg


def test_roundtrip_and_compare(tmp_path):
    rows_v1 = [
        ("Foreman", (0.9, 0.1, 0.79, 0.01, 31.82)),
        ("Jockey", (71.5, 6.4, 64.58, 0.50, 27.32)),
    ]
    reg.write_results(tmp_path, 1, "[ Version= 1 ]", rows_v1)
    # v2: kernel slower by 0.2ms on Jockey, PSNR drop 0.6 on Foreman.
    rows_v2 = [
        ("Foreman", (0.9, 0.1, 0.79, 0.01, 31.20)),
        ("Jockey", (71.6, 6.4, 64.78, 0.50, 27.32)),
    ]
    reg.write_results(tmp_path, 2, "[ Version= 2 ]", rows_v2)
    regs = reg.compare_versions(tmp_path, 2, ["Foreman", "Jockey"])
    found = {(r.sequence, r.column) for r in regs}
    assert ("Foreman", "PSNR") in found
    assert ("Jockey", "kernel") in found
    # within-epsilon deltas are not flagged
    assert ("Foreman", "kernel") not in found
    assert ("Jockey", "h2d") not in found


def test_epsilon_boundaries(tmp_path):
    reg.write_results(tmp_path, 1, "[h]", [("S", (10.0, 1.0, 5.0, 0.5, 30.0))])
    # exactly +0.1 ms and -0.5 dB are inside tolerance (strict comparisons)
    reg.write_results(tmp_path, 2, "[h]", [("S", (10.1, 1.1, 5.1, 0.6, 29.5))])
    assert reg.compare_versions(tmp_path, 2, ["S"]) == []
    reg.write_results(tmp_path, 3, "[h]", [("S", (10.21, 1.1, 5.1, 0.6, 28.99))])
    regs = reg.compare_versions(tmp_path, 3, ["S"])
    assert {(r.column) for r in regs} == {"totalTime", "PSNR"}


def test_matrix_gop_row_gated_transport_normalized():
    """compare_rows (round-4 verdict item 6): a real ~20% pipeline
    regression is flagged via the pct-of-link-bound row even under 2x
    link drift, while drift alone (raw ms doubling, pct stable) is not."""
    from motionestimation_tpu.bench.matrix import compare_rows

    prev = {
        "kernel-row": "10.0",
        "gop-e2e: raw": "250.0",
        "gop-e2e-pct: gated": "90.0",
    }
    # Link 2x slower AND pipeline 20% worse: raw ms 2.4x, pct -18 pts.
    rows = [
        ("kernel-row", 10.0),
        ("gop-e2e: raw", 600.0),
        ("gop-e2e-pct: gated", 72.0),
    ]
    lines, regs = compare_rows(rows, prev)
    assert regs == 1
    assert any(l.startswith("REGRESSION: gop-e2e-pct") for l in lines)
    assert any(l.startswith("info: gop-e2e:") for l in lines)
    # Pure link drift: raw ms doubles, pct wiggles within the band.
    rows = [
        ("kernel-row", 10.0),
        ("gop-e2e: raw", 500.0),
        ("gop-e2e-pct: gated", 86.0),
    ]
    lines, regs = compare_rows(rows, prev)
    assert regs == 0
    # Kernel rows keep the reference's absolute 0.1 ms rule.
    lines, regs = compare_rows([("kernel-row", 10.11)], prev)
    assert regs == 1


def test_version_one_has_no_baseline(tmp_path):
    reg.write_results(tmp_path, 1, "[h]", [("S", (1, 1, 1, 1, 30.0))])
    assert reg.compare_versions(tmp_path, 1, ["S"]) == []


def test_read_rows_skips_header(tmp_path):
    reg.write_results(
        tmp_path, 1, "[ Version= 1, BlkDim= 8 ]",
        [("A", (0.1, 0.2, 0.3, 0.4, 31.0)), ("B", (1, 2, 3, 4, 27.0))],
    )
    rows = reg.read_rows(tmp_path, 1, 2)
    assert np.allclose(rows[0], [0.1, 0.2, 0.3, 0.4, 31.0])
    assert np.allclose(rows[1], [1, 2, 3, 4, 27.0])
