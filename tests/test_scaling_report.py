"""BENCH/BASELINE.md report writer (tools/run_scaling.py) — pure-Python."""

from __future__ import annotations

import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_run_scaling():
    spec = importlib.util.spec_from_file_location(
        "run_scaling", os.path.join(ROOT, "tools", "run_scaling.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_write_report_renders_gate_and_stages(tmp_path, monkeypatch):
    rs = _load_run_scaling()
    monkeypatch.setattr(rs, "ROOT", str(tmp_path))
    os.makedirs(tmp_path / "BENCH")
    report = {
        "convs": 1000,
        "turns": 7000,
        "levels": {
            "2": {"wall_s": 400.0, "turns_per_sec": 17.5, "triples_per_sec": 1.0,
                   "wall_all": [410.0, 400.0, 420.0],
                   "stages": {"t_extract_link": 300.0, "t_canonicalize": 5.0}},
            "8": {"wall_s": 120.0, "turns_per_sec": 58.3, "triples_per_sec": 3.3,
                   "wall_all": [120.0],
                   "stages": {"t_extract_link": 90.0, "t_canonicalize": 5.0}},
        },
        "pairs": [{"low": 2, "high": 8, "speedup": 3.333, "efficiency": 0.833,
                   "gate": True}],
    }
    rs.write_report(report, runs=3)
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "| 2 → 8 | 3.33× | **0.833** | PASS |" in md
    assert "[400.0, 410.0, 420.0]" in md          # sorted spread shown
    assert "extract_link" in md and "canonicalize" in md
    assert "Connected components at graph scale" in md
    assert "MEDIAN of 3 run(s)" in md


def test_report_only_reads_scaling_json(tmp_path, monkeypatch):
    rs = _load_run_scaling()
    monkeypatch.setattr(rs, "ROOT", str(tmp_path))
    os.makedirs(tmp_path / "BENCH")
    report = {"convs": 10, "turns": 70, "runs": 2,
              "levels": {"2": {"wall_s": 4.0, "turns_per_sec": 17.5,
                                "triples_per_sec": 1.0}},
              "pairs": []}
    (tmp_path / "BENCH" / "scaling.json").write_text(json.dumps(report))
    monkeypatch.setattr("sys.argv", ["run_scaling.py", "--report-only"])
    assert rs.main() == 0
    assert "MEDIAN of 2 run(s)" in (tmp_path / "BENCH" / "BASELINE.md").read_text()
