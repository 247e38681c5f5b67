"""The real-weights readiness runbook must dry-run end-to-end with synthetic
stand-in artifacts (VERDICT r2 item 4): tokenizer -> convert -> golden
activations (torch oracles fed the same ckpt) -> full eval protocol ->
int8-vs-bf16 A/B.  On the real artifact day only the paths change."""

import json
import os
import sys

import pytest

torch = pytest.importorskip("torch")

pytestmark = pytest.mark.skipif(
    not os.path.isdir("/root/reference/ldm"), reason="reference checkout absent"
)


@pytest.mark.slow
def test_runbook_synthetic_dry_run(tmp_path):
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    import real_weights_runbook as rb

    out = str(tmp_path / "runbook")
    rc = rb.main(["--synthetic", "--out", out, "--limit", "2"])
    report = json.load(open(os.path.join(out, "report.json")))
    assert set(report) == {"tokenizer", "convert", "golden", "eval", "ab"}
    for stage, r in report.items():
        assert r["ok"], f"stage {stage} failed: {r}"
    assert rc == 0
    # the metric txt exists and carries the three metrics
    txt = open(report["eval"]["metric_files"][0]).read()
    assert "psnr" in txt.lower()
