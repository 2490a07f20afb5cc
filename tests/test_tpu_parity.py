"""Real-TPU parity gate (VERDICT r2 item 4).

The BASELINE correctness bar is PSNR >= 40 dB vs the reference backend
for every benchmark config ON REAL TPU hardware — a class of deviation
(MXU default-precision rounding, tile-relative FMA ULP differences)
that interpret-mode CPU tests can never see. The numbers are measured
by ``benchmarks/bench_all.py`` (``psnr_config``) on the TPU and
committed to ``benchmarks/results_r03.json``; this test enforces the
bar on the committed record so a regression that lowers any config
below 40 dB fails the suite once the new results land.
"""
import json
import pathlib

import pytest

RESULTS = (pathlib.Path(__file__).parent.parent / "benchmarks"
           / "results_r03.json")
BAR_DB = 40.0


def _load():
    if not RESULTS.exists():
        pytest.skip("no TPU results file committed yet")
    return json.loads(RESULTS.read_text())


@pytest.mark.parametrize("config_idx", [1, 2, 3, 4, 5])
def test_config_psnr_vs_reference_on_tpu(config_idx):
    rows = [r for r in _load() if r.get("config") == config_idx]
    if not rows and config_idx == 5:
        # Config 5 (1M tris @4K) is measured in a separate at-spec
        # invocation because its whole-program compile can exceed the
        # remote helper's window; its row merges in when that run
        # lands (benchmarks/tpu_round4.sh step 60). Configs 1-4 are
        # always required.
        pytest.skip("config-5 at-spec row pending (separate run)")
    assert rows, f"config {config_idx} missing from {RESULTS.name}"
    row = rows[0]
    assert "psnr_vs_reference_db" in row, (
        f"config {config_idx} has no recorded TPU parity number: "
        f"{row.get('psnr_error', row)}")
    psnr = row["psnr_vs_reference_db"]
    assert psnr >= BAR_DB, (
        f"config {config_idx}: {psnr} dB on TPU is below the "
        f"{BAR_DB} dB BASELINE bar (scale {row.get('psnr_scale')})")
