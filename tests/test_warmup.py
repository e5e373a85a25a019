"""Warmup hints: record/save/load roundtrip and CPU gating."""

import json
import os

from floria_tpu import warmup


def test_record_save_cpu_gated(tmp_path, monkeypatch):
    """CPU runs never write hints (their shape churn would queue
    pointless remote compiles later)."""
    path = tmp_path / "hints.json"
    monkeypatch.setenv(warmup._HINTS_ENV, str(path))
    warmup._seen.clear()
    warmup._seen_set.clear()
    warmup.record("beam_mixed", (4, 64, 128, 5, 10, 8, 0, True))
    warmup.save()  # backend is cpu under the test harness
    assert not path.exists()


def test_hints_roundtrip_and_cap(tmp_path, monkeypatch):
    path = tmp_path / "hints.json"
    monkeypatch.setenv(warmup._HINTS_ENV, str(path))
    # Pre-seed an existing file to check merging.
    path.write_text(json.dumps([["nw", [8, 32768, 65536, 4, 2]]]))
    warmup._seen.clear()
    warmup._seen_set.clear()
    warmup.record("upem", (2, 64, 128, 2, 4))
    warmup.record("upem", (2, 64, 128, 2, 4))  # dedup
    # Bypass the cpu gate to exercise the merge/cap logic.
    monkeypatch.setattr("jax.default_backend", lambda: "tpu")
    warmup.save()
    entries = json.loads(path.read_text())
    assert ["nw", [8, 32768, 65536, 4, 2]] in entries
    assert ["upem", [2, 64, 128, 2, 4]] in entries
    assert len(entries) == 2
    # this run's variants order before prior hints
    assert entries[0] == ["upem", [2, 64, 128, 2, 4]]
    warmup._seen.clear()
    warmup._seen_set.clear()


def test_start_noop_on_cpu(monkeypatch, tmp_path):
    monkeypatch.setenv(warmup._HINTS_ENV, str(tmp_path / "h.json"))
    monkeypatch.setattr(warmup, "_started", False)
    warmup.start()  # cpu backend -> returns without touching the file
    assert not os.path.exists(tmp_path / "h.json")
