"""Capture a jax.profiler trace of the steady-state train chunk and print an
aggregated per-op breakdown (SURVEY §5: tracing/profiling is new TPU surface;
the reference has only wall-clock prints, train_real.py:422-431).

Runs the bench configuration (procedural BallCloudScene, flagship flags) to
steady state, wraps a few scanned chunks in `jax.profiler.trace`, then parses
the XPlane .trace.json.gz the profiler writes and aggregates device-op
durations by HLO category so the hot spots are readable without TensorBoard.

Usage:
  python tools/profile_trace.py [--out /tmp/trace] [--warm-chunks 12]
                                [--trace-chunks 3] [--top 40]
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys
import time

sys.path.insert(0, "tests")
sys.path.insert(0, ".")


def categorize(name: str) -> str:
    """Map an XLA/HLO op name to a coarse category for the rollup."""
    n = name.lower()
    if "fusion" in n:
        return "fusion"
    for key in ("gather", "scatter", "convert", "copy", "transpose", "dot",
                "reduce", "sort", "cumsum", "rng", "iota", "dynamic-slice",
                "dynamic-update-slice", "select", "broadcast", "concatenate",
                "custom-call", "all-reduce", "infeed", "outfeed"):
        if key in n:
            return key
    return "other"


def parse_trace(logdir: str, top: int):
    """Aggregate device-track event durations from the chrome-trace dump."""
    paths = sorted(glob.glob(
        os.path.join(logdir, "plugins/profile/*/*.trace.json.gz")))
    if not paths:
        print("no trace.json.gz found under", logdir)
        return
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # Identify device (TPU) process ids: their names mention TPU/device.
    pid_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            pid_names[ev["pid"]] = ev.get("args", {}).get("name", "")
    device_pids = {pid for pid, name in pid_names.items()
                   if re.search(r"tpu|device|/device:|axon", name, re.I)
                   and "host" not in name.lower()}
    print("# processes:", {pid: n for pid, n in pid_names.items()})

    by_op = collections.Counter()
    by_cat = collections.Counter()
    calls = collections.Counter()
    total = 0.0
    for ev in events:
        if ev.get("ph") != "X" or ev.get("pid") not in device_pids:
            continue
        dur = ev.get("dur", 0) / 1e3  # us -> ms
        name = ev.get("name", "?")
        by_op[name] += dur
        calls[name] += 1
        by_cat[categorize(name)] += dur
        total += dur

    print(f"\n# device op time total: {total:.2f} ms (across traced chunks)")
    print("\n## by category")
    for cat, ms in by_cat.most_common():
        print(f"{cat:24s} {ms:10.2f} ms  {100 * ms / max(total, 1e-9):5.1f}%")
    print(f"\n## top {top} ops")
    for name, ms in by_op.most_common(top):
        print(f"{ms:10.2f} ms  x{calls[name]:<6d} {name[:110]}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/jax_trace")
    ap.add_argument("--warm-chunks", type=int, default=14,
                    help="chunks (32 steps each) before tracing")
    ap.add_argument("--trace-chunks", type=int, default=3)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--cfg", default=None,
                    help="JSON dict of SceneConfig field overrides (e.g. "
                         "'{\"target_sample_batch_size\": 1048576}')")
    ap.add_argument("--parse-only", action="store_true",
                    help="just parse an existing trace dir")
    args = ap.parse_args()

    if args.parse_only:
        parse_trace(args.out, args.top)
        return

    import jax

    from cednerf_tpu.utils import enable_compile_cache
    enable_compile_cache()
    from synthetic_scene import BallCloudScene

    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config
    from cednerf_tpu.engine.train import Trainer

    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
    )
    cfg = dnerf_config(max_steps=100000)
    if args.cfg:
        import dataclasses
        cfg = dataclasses.replace(cfg, **json.loads(args.cfg))
    field = build_field(cfg, flags)
    scene = BallCloudScene(n_cams=8, wh=128, n_times=8)
    trainer = Trainer(field, cfg, flags, scene, seed=0,
                      device_sampler=scene.device_sampler(), steps_per_call=32)

    t0 = time.perf_counter()
    for _ in range(args.warm_chunks):
        m = trainer.run_chunk()
        print(f"# step={trainer.step} rays={m['num_rays']} "
              f"nsamp={int(m['n_samples'])}", file=sys.stderr, flush=True)
    trainer.adapt_bucket = False
    # settle: one more chunk so the steady program is warm
    trainer.run_chunk()
    print(f"# warmup done in {time.perf_counter() - t0:.0f}s",
          file=sys.stderr, flush=True)

    with jax.profiler.trace(args.out):
        for _ in range(args.trace_chunks):
            trainer.run_chunk()  # fetches metrics -> host sync inside

    print("# trace written to", args.out, file=sys.stderr, flush=True)
    parse_trace(args.out, args.top)


if __name__ == "__main__":
    main()
