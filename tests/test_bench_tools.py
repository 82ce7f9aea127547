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


def test_bench_ladder_json_line_parsing():
    bench = _load("bench_mod2", REPO / "bench.py")
    good = json.dumps({"metric": "train_samples_per_sec", "value": 4.2e6,
                       "unit": "samples/s", "vs_baseline": 0.35})
    text = "# warmup\n{not json\n" + good + "\n# trailing comment\n"
    out = bench._json_result_line(text)
    assert out["value"] == 4.2e6
    assert bench._json_result_line("# nothing here\n") is None
    # dict lines without a value key are skipped
    assert bench._json_result_line('{"metric": "x"}\n') is None


def test_bench_ladder_candidate_cfg_is_valid(monkeypatch):
    """The ladder's candidate must be applicable to the bench SceneConfig —
    a typo'd knob would make the unattended fallback path crash instead of
    measuring (dataclasses.replace raises on unknown fields)."""
    import dataclasses

    bench = _load("bench_mod3", REPO / "bench.py")
    from cednerf_tpu.engine.config import dnerf_config

    cfg = dataclasses.replace(dnerf_config(max_steps=1),
                              **bench._LADDER_CANDIDATE)
    assert cfg.target_sample_batch_size == 1 << 20
    assert cfg.march_seg == 8 and cfg.remat_feats


def test_bench_ladder_subprocess_contract(tmp_path, monkeypatch):
    """_try_ladder_candidate must pass the cfg via env, disable recursion,
    and surface the child's final JSON line."""
    import subprocess

    bench = _load("bench_mod4", REPO / "bench.py")
    calls = {}

    class FakeProc:
        returncode = 0
        stdout = b'# log\n{"metric": "m", "value": 5.0, "unit": "u"}\n'

    def fake_run(cmd, timeout, env, stdout):
        calls["cfg"] = json.loads(env[bench._CFG_ENV])
        calls["ladder"] = env[bench._LADDER_ENV]
        calls["timeout"] = timeout
        return FakeProc()

    monkeypatch.setattr(subprocess, "run", fake_run)
    out = bench._try_ladder_candidate("dnerf")
    assert out == {"metric": "m", "value": 5.0, "unit": "u"}
    assert calls["cfg"] == bench._LADDER_CANDIDATE
    assert calls["ladder"] == "0"
    assert calls["timeout"] == bench._LADDER_TIMEOUT_S

    def fail_run(cmd, timeout, env, stdout):
        raise subprocess.TimeoutExpired(cmd, timeout)

    monkeypatch.setattr(subprocess, "run", fail_run)
    assert bench._try_ladder_candidate("dnerf") is None


def test_parse_bench_log_with_bool_override(picker, tmp_path):
    """The ladder candidate carries remat_feats=true — the overrides line
    must round-trip through the picker (bench.py emits json.dumps)."""
    log = tmp_path / "bench_xla_1m_seg.log"
    _write_bench_log(log, 4.5e6, {"target_sample_batch_size": 1048576,
                                  "march_seg": 8, "remat_feats": True})
    overrides, value = picker.parse_bench_log(log)
    assert overrides["remat_feats"] is True
    assert value == 4.5e6


def test_ttq_tracker_thresholds_and_compile_estimate(monkeypatch):
    """tools/ttq.py: first-crossing wall clocks, never-hit -> None, and the
    compile estimate = first chunk minus the median later chunk."""
    ttq_mod = _load("ttq", REPO / "tools" / "ttq.py")

    clock = {"t": 100.0}
    monkeypatch.setattr(ttq_mod.time, "perf_counter", lambda: clock["t"])
    tr = ttq_mod.TTQTracker([20, 28, 30])

    # first chunk: 60 s (compile-dominated), psnr 18
    clock["t"] += 60.0
    tr.update(16, 18.0)
    # steady 2 s chunks climbing through the thresholds
    for step, psnr in ((32, 21.0), (48, 26.0), (64, 28.5), (80, 29.0)):
        clock["t"] += 2.0
        tr.update(step, psnr)

    res = tr.result()
    assert res["ttq_s"]["20"] == [62.0, 32]
    assert res["ttq_s"]["28"] == [66.0, 64]
    assert res["ttq_s"]["30"] is None
    assert res["median_chunk_s"] == 2.0
    assert res["compile_s_estimate"] == 58.0
    # monotone: an earlier threshold can't be hit later
    assert res["ttq_s"]["20"][0] <= res["ttq_s"]["28"][0]
