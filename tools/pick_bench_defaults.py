"""Promote the measurement queue's winning bench combo to bench_defaults.json.

Scans an outdir (tools/tpu_session.sh's $OUT) for bench_*.log files, each the
output of one `CEDNERF_BENCH_CFG=... python bench.py` run: stderr carries a
`# bench: cfg overrides {...}` line and stdout the final JSON metric line.
Picks the highest train_samples_per_sec and writes repo-root
bench_defaults.json = {"cfg": <overrides>, "source": <stage>, "value": N},
which bench.py uses when CEDNERF_BENCH_CFG is unset. The default-config run
(bench_default.log, no overrides line) competes with cfg={} — if it wins,
the written file is a no-op marker rather than a regression.

A combo only competes if its quality gate is not measurably worse: when the
combo raises the sample budget and both val_1m/result.json and
val_default/result.json exist (same scene/steps, budgets 1M vs default), the
1M arm's eval_psnr must be within --gate_db (default 0.3) of the default
arm's. Missing gates don't block — unattended promotion favors the measured
throughput winner.

Usage: python tools/pick_bench_defaults.py /tmp/tpu_session
"""

import argparse
import json
import pathlib
import re
import sys


def parse_bench_log(path: pathlib.Path):
    """Returns (overrides_dict, samples_per_sec) or None if incomplete."""
    overrides, value = {}, None
    for line in path.read_text().splitlines():
        m = re.match(r"# bench: cfg overrides (\{.*\})", line)
        if m:
            overrides = json.loads(m.group(1).replace("'", '"'))
        elif line.startswith("{"):
            try:
                rec = json.loads(line)
            except json.JSONDecodeError:
                continue
            if rec.get("metric") == "train_samples_per_sec":
                value = rec["value"]
    return None if value is None else (overrides, value)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", type=pathlib.Path)
    ap.add_argument("--gate_db", type=float, default=0.3)
    ap.add_argument("--dry_run", action="store_true")
    ap.add_argument("--repo_root", type=pathlib.Path,
                    default=pathlib.Path(__file__).resolve().parent.parent)
    args = ap.parse_args()

    repo = args.repo_root
    runs = {}
    for log in sorted(args.outdir.glob("bench_*.log")):
        parsed = parse_bench_log(log)
        if parsed:
            runs[log.stem] = parsed
        else:
            print(f"# {log.name}: no metric line (failed run?)", file=sys.stderr)
    if not runs:
        print("no complete bench runs found", file=sys.stderr)
        return 1

    def gate_psnr(name):
        p = args.outdir / name / "result.json"
        return json.loads(p.read_text())["eval_psnr"] if p.exists() else None

    big_gate = gate_psnr("val_1m")
    base_gate = gate_psnr("val_default")
    for name, (cfg, value) in sorted(runs.items(), key=lambda kv: -kv[1][1]):
        raises_budget = cfg.get("target_sample_batch_size", 0) > 2 ** 18
        if raises_budget and big_gate is not None and base_gate is not None \
                and big_gate < base_gate - args.gate_db:
            print(f"# {name}: {value:.0f}/s but 1M-budget gate {big_gate} dB "
                  f"< {base_gate} - {args.gate_db} — skipped", file=sys.stderr)
            continue
        picked = {"cfg": cfg, "source": name, "value": value}
        print(json.dumps(picked))
        if not args.dry_run:
            (repo / "bench_defaults.json").write_text(
                json.dumps(picked, indent=2) + "\n")
        return 0
    print("every candidate failed its quality gate", file=sys.stderr)
    return 1


if __name__ == "__main__":
    sys.exit(main())
