"""The examples must actually run — they are the 'switching user's
first session' and rot silently otherwise."""

import subprocess
import sys


def test_curation_pipeline_example_runs():
    out = subprocess.run(
        [sys.executable, "examples/curation_pipeline.py", "/root/testdata/sf0.001"],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "after near-dedup" in out.stdout
    assert "train" in out.stdout and "test" in out.stdout


def test_event_store_tour_example_runs(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            "examples/event_store_tour.py",
            str(tmp_path / "tour"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "acked id ranges" in out.stdout
    assert "format('flo') scan sees 6 events" in out.stdout


def test_training_data_eval_example_runs():
    out = subprocess.run(
        [
            sys.executable,
            "examples/training_data_eval.py",
            "/root/testdata/sf0.001",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "no_leakage=True" in out.stdout
    assert "AUC=" in out.stdout
    assert "planted: 40" in out.stdout
    assert "tour complete" in out.stdout


def test_governed_lake_tour_example_runs(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            "examples/governed_lake_tour.py",
            str(tmp_path / "gov"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "user 2 fully retracted" in out.stdout
    assert "physically erased" in out.stdout
    assert "governed-lake tour complete" in out.stdout


def test_remote_client_tour_example_runs(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            "examples/remote_client_tour.py",
            str(tmp_path / "tour"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "pipelined batch acked 4 ids" in out.stdout
    assert "produced MID-CONSUME" in out.stdout
    assert "scan sees 9 events" in out.stdout


def test_lakehouse_crud_tour_example_runs(tmp_path):
    out = subprocess.run(
        [
            sys.executable,
            "examples/lakehouse_crud_tour.py",
            str(tmp_path / "crud"),
        ],
        capture_output=True,
        text=True,
        timeout=300,
        cwd="/root/repo",
    )
    assert out.returncode == 0, out.stderr[-2000:]
    assert "replayed batch was a no-op" in out.stdout
    assert "0 fragments rewritten" in out.stdout
    assert "IVM from CDF deltas == direct recompute" in out.stdout
    assert "rows unchanged" in out.stdout
    assert "lakehouse CRUD tour complete" in out.stdout
