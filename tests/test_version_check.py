"""Upgrade / version-check entry point (PARITY row 72).

Reference analogue: whisperjav/version_checker.py + upgrade.py — the
release poll survives offline, and the upgrade action delegates to pip
(wheel self-replacement is a package-manager concern here).
"""

import whisperjav_tpu.utils.version_check as vc


def test_parse_version_orders_prereleases():
    assert vc.parse_version("v1.3.0rc1") == (1, 3, 0)
    assert vc.parse_version("1.2.9") < vc.parse_version("v1.3.0")


def test_check_latest_version_offline_returns_none():
    # zero-egress environment: the GitHub poll must fail gracefully
    assert vc.check_latest_version(timeout=0.5) is None


def test_upgrade_main_offline(capsys):
    assert vc.upgrade_main([]) == 0
    out = capsys.readouterr().out
    assert "unavailable" in out


def test_upgrade_main_dry_run_offline(capsys):
    # explicit upgrade request while offline: print the pip command
    assert vc.upgrade_main(["--dry-run"]) == 0
    out = capsys.readouterr().out
    assert "pip" in out and "whisperjav-tpu" in out


def test_upgrade_main_newer_runs_pip(monkeypatch, capsys):
    monkeypatch.setattr(vc, "check_latest_version",
                        lambda timeout=5.0: {"latest": "v99.0.0",
                                             "newer": True, "url": None})
    calls = []
    monkeypatch.setattr(vc, "run_pip_upgrade",
                        lambda dry_run=False: calls.append(dry_run) or 0)
    assert vc.upgrade_main(["--run"]) == 0
    assert calls == [False]
    assert "newer release" in capsys.readouterr().out


def test_upgrade_main_up_to_date(monkeypatch, capsys):
    monkeypatch.setattr(vc, "check_latest_version",
                        lambda timeout=5.0: {"latest": "v0.0.1",
                                             "newer": False, "url": None})
    assert vc.upgrade_main([]) == 0
    assert "up to date" in capsys.readouterr().out
