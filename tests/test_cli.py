"""CLI surface (`python -m hunt_ray`, the hunt-server binary analog):
build → search → bm25 through real subprocesses (each owns its own Ray
session, mirroring how a user drives it)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

from hunt_ray.fixtures.pages import write_pages

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(*args: str) -> subprocess.CompletedProcess:
    env = dict(os.environ, PYTHONPATH=REPO, RAY_GRAFT_CPUS="2")
    return subprocess.run([sys.executable, "-m", "hunt_ray", *args],
                          capture_output=True, text=True, timeout=300,
                          cwd=REPO, env=env)


@pytest.fixture(scope="module")
def cli_index(tmp_path_factory):
    pages = str(tmp_path_factory.mktemp("clipages"))
    write_pages(pages, seed=42, n_rows=80, rows_per_file=40)
    index = str(tmp_path_factory.mktemp("cliidx"))
    r = _run("build", "--pages", pages, "--index", index,
             "--partitions", "2", "--batch-size", "64")
    assert r.returncode == 0, r.stderr[-2000:]
    return index


def test_cli_build_and_search(cli_index):
    r = _run("search", "--index", cli_index, "brain", "--limit", "5")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["count"] > 0
    assert all("uri" in h and "score" in h for h in out["result"])


def test_cli_bm25(cli_index):
    r = _run("bm25", "--index", cli_index, "brain world", "--k", "3")
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])["result"]
    assert len(out) > 0 and all("uri" in h and "score" in h for h in out)
