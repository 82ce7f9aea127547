"""Unattended bench-default promotion: bench.py override loading +
tools/pick_bench_defaults.py selection/gating logic (tools/tpu_session.sh
runs the picker with nobody watching — these tests are its safety net)."""

import importlib.util
import json
import pathlib
import sys

import pytest

REPO = pathlib.Path(__file__).resolve().parent.parent


def _load(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture()
def picker():
    return _load("pick_bench_defaults", REPO / "tools" / "pick_bench_defaults.py")


def _write_bench_log(path, value, overrides=None):
    lines = []
    if overrides is not None:
        lines.append(f"# bench: cfg overrides {json.dumps(overrides)}")
    lines.append(json.dumps({"metric": "train_samples_per_sec",
                             "value": value, "unit": "samples/s",
                             "vs_baseline": round(value / 12e6, 3)}))
    path.write_text("\n".join(lines) + "\n")


def test_parse_bench_log(picker, tmp_path):
    log = tmp_path / "bench_x.log"
    _write_bench_log(log, 3.2e6, {"scatter_impl": "fused"})
    overrides, value = picker.parse_bench_log(log)
    assert overrides == {"scatter_impl": "fused"} and value == 3.2e6
    # failed run (no metric line) -> None
    log.write_text("# bench: TPU backend init probe failed\n")
    assert picker.parse_bench_log(log) is None
    # bench.py prints the overrides dict with repr (single quotes)
    log.write_text("# bench: cfg overrides {'scatter_impl': 'fused'}\n"
                   + json.dumps({"metric": "train_samples_per_sec",
                                 "value": 1.0}) + "\n")
    assert picker.parse_bench_log(log) == ({"scatter_impl": "fused"}, 1.0)


def _run_picker(picker, outdir, monkeypatch, capsys, tmp_repo):
    monkeypatch.setattr(sys, "argv",
                        ["pick_bench_defaults.py", str(outdir),
                         "--repo_root", str(tmp_repo)])
    rc = picker.main()
    out = capsys.readouterr().out.strip().splitlines()
    return rc, (json.loads(out[-1]) if out else None)


def test_picker_prefers_fastest_gated_combo(picker, tmp_path, monkeypatch,
                                            capsys):
    out = tmp_path / "session"
    out.mkdir()
    _write_bench_log(out / "bench_default.log", 2.1e6)
    _write_bench_log(out / "bench_fused.log", 2.9e6, {"scatter_impl": "fused"})
    _write_bench_log(out / "bench_fused_1m.log", 6.1e6,
                     {"scatter_impl": "fused",
                      "target_sample_batch_size": 1 << 20})
    for name, db in (("val_default", 31.1), ("val_1m", 30.9)):
        d = out / name
        d.mkdir()
        (d / "result.json").write_text(json.dumps({"eval_psnr": db}))
    rc, picked = _run_picker(picker, out, monkeypatch, capsys, tmp_path)
    assert rc == 0 and picked["source"] == "bench_fused_1m"
    written = json.loads((tmp_path / "bench_defaults.json").read_text())
    assert written["cfg"]["target_sample_batch_size"] == 1 << 20


def test_picker_gate_blocks_budget_raise(picker, tmp_path, monkeypatch,
                                         capsys):
    out = tmp_path / "session"
    out.mkdir()
    _write_bench_log(out / "bench_fused.log", 2.9e6, {"scatter_impl": "fused"})
    _write_bench_log(out / "bench_fused_1m.log", 6.1e6,
                     {"scatter_impl": "fused",
                      "target_sample_batch_size": 1 << 20})
    for name, db in (("val_default", 31.1), ("val_1m", 29.0)):
        d = out / name
        d.mkdir()
        (d / "result.json").write_text(json.dumps({"eval_psnr": db}))
    rc, picked = _run_picker(picker, out, monkeypatch, capsys, tmp_path)
    # 1M combo dropped (2.1 dB quality loss); falls back to same-budget combo
    assert rc == 0 and picked["source"] == "bench_fused"


def test_picker_no_runs(picker, tmp_path, monkeypatch, capsys):
    out = tmp_path / "empty"
    out.mkdir()
    rc, _ = _run_picker(picker, out, monkeypatch, capsys, tmp_path)
    assert rc == 1


def test_bench_load_overrides(tmp_path, monkeypatch):
    bench = _load("bench_mod", REPO / "bench.py")
    monkeypatch.setenv(bench._CFG_ENV, '{"a": 1}')
    assert bench._load_overrides() == {"a": 1}
    monkeypatch.delenv(bench._CFG_ENV)
    monkeypatch.setattr(bench, "_CFG_FILE", str(tmp_path / "bd.json"))
    assert bench._load_overrides() == {}
    (tmp_path / "bd.json").write_text(json.dumps(
        {"cfg": {"scatter_impl": "fused"}, "source": "t", "value": 1}))
    assert bench._load_overrides() == {"scatter_impl": "fused"}
