"""BENCH/BASELINE.md report writer (tools/run_scaling.py) — pure-Python."""

from __future__ import annotations

import importlib.util
import json
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_tool(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(ROOT, "tools", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _entry(convs=1000, turns=7000):
    return {
        "convs": convs,
        "turns": turns,
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


def test_write_report_renders_gate_and_stages(tmp_path, monkeypatch):
    rs = _load_tool("run_scaling")
    monkeypatch.setattr(rs, "ROOT", str(tmp_path))
    os.makedirs(tmp_path / "BENCH")
    report = {"runs": 3, "sets": [_entry(), _entry(convs=4000, turns=28000)]}
    rs.write_report(report)
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "| 2 → 8 | 3.33× | **0.833** | PASS |" in md
    assert "[400.0, 410.0, 420.0]" in md          # sorted spread shown
    assert "extract_link" in md and "canonicalize" in md
    assert "Connected components at graph scale" in md
    assert "MEDIAN of 3 run(s)" in md
    # one block per working set
    assert "Working set: 1,000 conversations" in md
    assert "Working set: 4,000 conversations" in md


def test_report_only_reads_and_migrates_old_scaling_json(tmp_path, monkeypatch):
    rs = _load_tool("run_scaling")
    monkeypatch.setattr(rs, "ROOT", str(tmp_path))
    os.makedirs(tmp_path / "BENCH")
    # pre-round-3 single-set format must still render
    report = {"convs": 10, "turns": 70, "runs": 2,
              "levels": {"2": {"wall_s": 4.0, "turns_per_sec": 17.5,
                                "triples_per_sec": 1.0}},
              "pairs": []}
    (tmp_path / "BENCH" / "scaling.json").write_text(json.dumps(report))
    monkeypatch.setattr("sys.argv", ["run_scaling.py", "--report-only"])
    assert rs.main() == 0
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "MEDIAN of 2 run(s)" in md
    assert "Working set: 10 conversations" in md


def test_merge_scaling_recomputes_pairs(tmp_path, monkeypatch):
    ms = _load_tool("merge_scaling")
    monkeypatch.setattr(ms, "ROOT", str(tmp_path))
    os.makedirs(tmp_path / "BENCH")

    def lvl(w):
        return {"wall_s": w, "turns_per_sec": round(700 / w, 1),
                "triples_per_sec": 1.0, "wall_all": [w]}

    base = {"convs": 10, "turns": 700, "runs": 3,
            "levels": {"2": lvl(400.0), "8": lvl(160.0), "32": lvl(120.0)},
            "pairs": []}
    extra = {"convs": 10, "turns": 700,
             "levels": {"1": lvl(800.0), "4": lvl(240.0)}, "pairs": []}
    (tmp_path / "base.json").write_text(json.dumps(base))
    (tmp_path / "extra.json").write_text(json.dumps(extra))
    monkeypatch.setattr(
        "sys.argv",
        ["merge_scaling.py", str(tmp_path / "base.json"),
         str(tmp_path / "extra.json"), "--runs-note", "3"],
    )
    assert ms.main() == 0
    merged = json.loads((tmp_path / "BENCH" / "scaling.json").read_text())
    assert len(merged["sets"]) == 1
    by = {(p["low"], p["high"]): p for p in merged["sets"][0]["pairs"]}
    assert by[(1, 4)]["efficiency"] == 0.833 and by[(1, 4)]["gate"]
    assert by[(2, 8)]["efficiency"] == 0.625 and not by[(2, 8)]["gate"]
    assert (2, 8) in by and (8, 32) in by and len(by) == 3
    assert "| 1 → 4 |" in (tmp_path / "BENCH" / "BASELINE.md").read_text()


def test_merge_scaling_appends_distinct_working_set(tmp_path, monkeypatch):
    ms = _load_tool("merge_scaling")
    monkeypatch.setattr(ms, "ROOT", str(tmp_path))
    os.makedirs(tmp_path / "BENCH")

    def lvl(w):
        return {"wall_s": w, "turns_per_sec": round(700 / w, 1),
                "triples_per_sec": 1.0, "wall_all": [w]}

    base = {"convs": 10, "turns": 700, "runs": 3,
            "levels": {"1": lvl(800.0), "4": lvl(250.0)}, "pairs": []}
    extra = {"convs": 40, "turns": 2800,
             "levels": {"1": lvl(3200.0), "4": lvl(1000.0)}, "pairs": []}
    (tmp_path / "base.json").write_text(json.dumps(base))
    (tmp_path / "extra.json").write_text(json.dumps(extra))
    monkeypatch.setattr(
        "sys.argv",
        ["merge_scaling.py", str(tmp_path / "base.json"),
         str(tmp_path / "extra.json"), "--runs-note", "3"],
    )
    assert ms.main() == 0
    merged = json.loads((tmp_path / "BENCH" / "scaling.json").read_text())
    assert [s["convs"] for s in merged["sets"]] == [10, 40]
    assert merged["sets"][0]["pairs"][0]["efficiency"] == 0.8
    assert merged["sets"][1]["pairs"][0]["efficiency"] == 0.8
    md = (tmp_path / "BENCH" / "BASELINE.md").read_text()
    assert "Working set: 10 conversations" in md
    assert "Working set: 40 conversations" in md
