"""Raw-CSV → trained-model chain drill (VERDICT round-4 item 1b).

One invocation of ``tools/etl_drill.py`` chains the ENTIRE pipeline on data
entering in the rawest supported form: synthetic raw ATC sensor CSVs →
``crowdmod etl`` (500 ms aggregation → rotation/LU filter → binning →
windows → pickles → DATA_LIST) → ``crowdmod train`` (real CLI subprocess)
→ checkpoint restore → conditioned sampling — and must clear the
tools/validate_e2e.py criterion: trained beats untrained by ≥3 dB density
PSNR.  The per-stage correctness of the ETL is separately held to the
live-reference oracle (tests/test_etl_reference_oracle.py); this drill
proves the stages compose.

Calibration (round 5, CPU tier): 20 epochs @ lr 2e-4 on 3×152-window files
scores ~+4 dB (16 epochs: +3.29); full profile in VALIDATION.md.
"""

import json
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_etl_raw_to_train_drill(tmp_path):
    import sys

    sys.path.insert(0, os.path.join(REPO))
    from tools.etl_drill import main as drill_main

    report_path = tmp_path / "report.json"
    rc = drill_main([
        "--out", str(tmp_path / "drill"),
        "--epochs", "20", "--n-frames", "160",
        "--report", str(report_path),
    ])
    assert rc == 0
    report = json.loads(report_path.read_text())
    assert report["ok"] is True
    assert report["improvement_db"] > 3.0
    # The chain really started from raw sensor CSVs and built its own corpus.
    drill = tmp_path / "drill"
    assert (drill / "raw" / "walkers_0.csv").exists()
    assert (drill / "agg" / "walkers_0.csv").exists()
    assert (drill / "pickle" / "walkers_0.pkl").exists()
    assert report["windows"] == 3 * 152
