"""CLI smoke tests — the mirror of the reference's whole test suite
(tests/test_cli.py:18-29: module entry point and group exit 0)."""

from __future__ import annotations

import subprocess
import sys


def run_cli(*args: str) -> subprocess.CompletedProcess:
    return subprocess.run(
        [sys.executable, "-m", "bdc_collection_builder_spark", *args],
        capture_output=True, text=True, timeout=300, cwd="/root/repo",
    )


def test_module_entry_exits_zero():
    assert run_cli().returncode == 0


def test_help_exits_zero():
    assert run_cli("--help").returncode == 0


def test_list_queries():
    out = run_cli("list-queries")
    assert out.returncode == 0
    lines = out.stdout.strip().splitlines()
    assert len(lines) >= 100
    assert any(line.startswith("q1_pricing_summary") for line in lines)
