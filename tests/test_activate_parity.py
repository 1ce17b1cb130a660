"""scripts/activate_parity.py — the one-command gated-parity activation harness
must run end-to-end against synthesized stand-ins (PARITY.md "Known gaps" 1-3),
so the moment the real artifacts appear the validations are turnkey."""
import argparse
import importlib.util
import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(REPO, "scripts", "activate_parity.py")


@pytest.fixture(scope="module")
def parity():
    spec = importlib.util.spec_from_file_location("activate_parity", SCRIPT)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_dry_run_all_validations_pass(parity, tmp_path):
    paths = parity.make_dry_run_artifacts(str(tmp_path))
    args = argparse.Namespace(
        aeskconv=paths["aeskconv"], smplx=paths["smplx"],
        hub_disco=paths["hub_disco"], hub_camn=paths["hub_camn"],
        hub_emage=paths["hub_emage"],
    )
    report = parity.run(args)
    assert set(report["validations"]) == {
        "fgd_aeskconv", "smplx_fk", "hub_disco", "hub_camn", "hub_emage"}
    for name, v in report["validations"].items():
        assert v["status"] == "pass", (name, v)
    assert report["ok"]
    # the embedder check is a real value-parity pin, not just an import
    assert report["validations"]["fgd_aeskconv"]["detail"][
        "torch_oracle_max_abs_diff"] < 1e-4


def test_corrupt_artifact_reports_fail_not_crash(parity, tmp_path):
    bad = tmp_path / "AESKConv_240_100.bin"
    bad.write_bytes(b"not a torch file")
    args = argparse.Namespace(aeskconv=str(bad), smplx=None, hub_disco=None,
                              hub_camn=None, hub_emage=None)
    report = parity.run(args)
    assert report["validations"]["fgd_aeskconv"]["status"] == "fail"
    assert not report["ok"]
