from __future__ import annotations

import json
import sys

from tests.conftest import SF_SMOKE


def test_run_cli_main(spark, tmp_path, capsys, monkeypatch):
    """The cron-equivalent CLI end-to-end (reuses the test session via
    getOrCreate): one batch run, JSON report, idempotent rerun."""
    from metrics_database_cron_script_spark.run import main

    state = str(tmp_path / "state")
    monkeypatch.setattr(
        sys, "argv", ["run.py", "--sf-dir", SF_SMOKE, "--state-dir", state]
    )
    main()
    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert int(report["prices_appended"]) > 0
    assert int(report["tx_appended"]) > 0

    main()
    report2 = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert int(report2["tx_appended"]) == 0  # rerun is a no-op
