"""bench.py kernel-floor guard (VERDICT r4 #2: a silent ~3x device-
kernel regression must not survive a bench run unnoticed)."""

import json

import bench


def _paths(tmp_path):
    floors = tmp_path / "bench_floors.json"
    best = tmp_path / "cache" / "kernel_best.json"
    return str(floors), str(best)


def test_committed_floor_fires(tmp_path, capsys):
    floors_path, best_path = _paths(tmp_path)
    with open(floors_path, "w") as fh:
        json.dump({"value": 90000.0,
                   "kernel_realshape_reads_per_sec": 15000.0}, fh)
    result = {"value": 35000.0, "kernel_realshape_reads_per_sec": 5100.0}
    fired = bench._check_kernel_floor(result, floors_path, best_path)
    assert fired
    assert "kernel_regression" in result
    assert result["kernel_regression"]["value"][
        "committed_floor"] == 90000.0
    assert "KERNEL REGRESSION" in capsys.readouterr().err


def test_session_best_halving_fires_and_best_only_improves(tmp_path):
    floors_path, best_path = _paths(tmp_path)
    ok = {"value": 100000.0}
    assert not bench._check_kernel_floor(ok, floors_path, best_path)
    with open(best_path) as fh:
        assert json.load(fh)["value"] == 100000.0
    # A small dip is tolerated (host noise), no flag, best unchanged.
    dip = {"value": 80000.0}
    assert not bench._check_kernel_floor(dip, floors_path, best_path)
    with open(best_path) as fh:
        assert json.load(fh)["value"] == 100000.0
    # A halving fires.
    bad = {"value": 40000.0}
    assert bench._check_kernel_floor(bad, floors_path, best_path)
    assert bad["kernel_regression"]["value"]["recorded_best"] == 100000.0


def test_quiet_when_healthy(tmp_path):
    floors_path, best_path = _paths(tmp_path)
    with open(floors_path, "w") as fh:
        json.dump({"value": 90000.0}, fh)
    result = {"value": 95000.0}
    assert not bench._check_kernel_floor(result, floors_path, best_path)
    assert "kernel_regression" not in result
