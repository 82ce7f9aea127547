"""End-to-end train-step throughput benchmark (runs on the real chip).

Trains the flagship dynamic radiance field on a procedural dynamic scene (an
opaque moving ball — no dataset files needed) with the D-NeRF preset shapes,
then measures steady-state rendered samples/second through the full jitted
train step (marching + field + volume rendering + all losses + Adam), with
occupancy-grid updates on their normal 16-step cadence.

Baseline (BASELINE.md): the CUDA reference sustains ~12M rendered samples/s
end-to-end on HyperNeRF vrig_3dprinter (2^18 samples/step, 20k steps, 425 s).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import dataclasses
import json
import os
import sys
import time

import numpy as np

BASELINE_SAMPLES_PER_SEC = 12e6

# Optional knob overrides for unattended A/B benching (tools/tpu_session.sh):
# CEDNERF_BENCH_CFG='{"target_sample_batch_size": 1048576,
#                     "scatter_impl": "fused"}' python bench.py
# Values land on SceneConfig via dataclasses.replace; unknown keys fail fast.
# With the env var unset, a repo-root bench_defaults.json (written by
# tools/pick_bench_defaults.py from the measurement queue's combo benches)
# supplies the overrides — so an unattended queue run can promote its
# winning combo without a code change.
_CFG_ENV = "CEDNERF_BENCH_CFG"
_CFG_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_defaults.json")

# Fallback ladder for the unattended driver run when the measurement queue
# never got to promote a winner (bench_defaults.json absent, no env cfg):
# attempt the model-predicted best config (PERF_PLAN L2/L4: fixed per-op
# floors dominate at 2^18, so a 1M-sample budget with segment marching to
# keep the fine lattice ~budget-proportional and remat'd encoder residuals
# amortizes them) in a bounded subprocess; on OOM/timeout/any failure fall
# back to the measured-safe baked default. Every knob here is CPU-verified
# (tests/test_march_segments.py, test_impl_combos.py) and uses only XLA
# impls — no Pallas kernels that lack a real-Mosaic numerics check.
_LADDER_ENV = "CEDNERF_BENCH_LADDER"
_LADDER_CANDIDATE = {
    "target_sample_batch_size": 1 << 20,
    "march_seg": 8,
    "remat_feats": True,
}
_LADDER_TIMEOUT_S = 1500


def _json_result_line(text):
    """Last parseable JSON object line of a bench child's stdout, or None."""
    for line in reversed(text.splitlines()):
        line = line.strip()
        if line.startswith("{"):
            try:
                out = json.loads(line)
            except json.JSONDecodeError:
                continue
            if isinstance(out, dict) and "value" in out:
                return out
    return None


def _try_ladder_candidate(shape):
    """Run this script with the candidate cfg in a killable subprocess.

    Returns the child's parsed result dict, or None on any failure — the
    caller then runs the safe default in-process.
    """
    import subprocess

    env = dict(os.environ)
    env[_CFG_ENV] = json.dumps(_LADDER_CANDIDATE)
    env[_LADDER_ENV] = "0"  # no recursion
    print(f"# bench: attempting ladder candidate {_LADDER_CANDIDATE} "
          f"(timeout {_LADDER_TIMEOUT_S}s)", file=sys.stderr, flush=True)
    try:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--shape", shape],
            timeout=_LADDER_TIMEOUT_S, env=env, stdout=subprocess.PIPE)
    except subprocess.TimeoutExpired:
        print("# bench: ladder candidate timed out — falling back",
              file=sys.stderr, flush=True)
        return None
    if proc.returncode != 0:
        print(f"# bench: ladder candidate rc={proc.returncode} — falling "
              "back", file=sys.stderr, flush=True)
        return None
    return _json_result_line(proc.stdout.decode())


def _load_overrides():
    env = os.environ.get(_CFG_ENV)
    if env is not None:
        return json.loads(env)
    if os.path.exists(_CFG_FILE):
        with open(_CFG_FILE) as f:
            picked = json.load(f)
        print(f"# bench: using bench_defaults.json ({picked.get('source')}, "
              f"{picked.get('value')} samples/s when picked)",
              file=sys.stderr, flush=True)
        return picked["cfg"]
    return {}


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--shape", choices=("dnerf", "dynerf"), default="dnerf",
        help="dnerf (default, the driver-recorded number): 2^18 budget, "
             "on-device sampling. dynerf: 2^20 budget with HOST-assembled "
             "batches through the stacked scanned path — the real-dataset "
             "shape (DyNeRF ISG/IST batches are host/native-sampled), so it "
             "also measures host-assembly/device-compute overlap.")
    ap.add_argument(
        "--metric", choices=("samples_per_sec", "time_to_30db"),
        default="samples_per_sec",
        help="time_to_30db: wall-clock seconds (incl. compile) until the "
             "train PSNR on the procedural scene first reaches 30 dB — the "
             "reference's own published contract shape (seconds-to-PSNR, "
             "run_hyper.sh:3,6,9,12). Tracked in BASELINE.json.")
    args = ap.parse_args()

    # Fail fast if the TPU tunnel is down (first seen 2026-08-18: backend
    # init blocks forever in C and ignores signals) — probe in a killable
    # subprocess first; a clear nonzero exit beats a silent hang.
    import subprocess

    try:
        probe = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=300, capture_output=True)
        ok = probe.returncode == 0
    except subprocess.TimeoutExpired:
        ok = False
    if not ok:
        print("# bench: TPU backend init probe failed — tunnel down?",
              file=sys.stderr, flush=True)
        sys.exit(3)

    # Ladder only when nothing supplied a measured config (child runs carry
    # CEDNERF_BENCH_CFG, so they never re-enter).
    if (os.environ.get(_LADDER_ENV, "1") != "0"
            and os.environ.get(_CFG_ENV) is None
            and not os.path.exists(_CFG_FILE)):
        result = _try_ladder_candidate(args.shape)
        if result is not None:
            print(json.dumps(result))
            return
    import jax

    from cednerf_tpu.utils import enable_compile_cache
    cache_dir = enable_compile_cache()

    # surface persistent-cache behavior: a warm re-bench should HIT for
    # every program (the 686 s BENCH_r02 warmup was all first-compiles);
    # count writes (= misses) so the tail prints who paid what
    import logging

    cache_events = {"writes": 0, "hits": 0}

    class _CacheCounter(logging.Filter):
        def filter(self, record):
            msg = record.getMessage()
            if "persistent compilation cache" in msg:
                if "Writing" in msg:
                    cache_events["writes"] += 1
                elif "cache hit" in msg or "Getting" in msg:
                    cache_events["hits"] += 1
                return False  # counted; suppress the hit/write chatter
            # pass everything else through (e.g. cache WRITE FAILURES
            # must not be swallowed — ADVICE r3 #3)
            return True

    _cache_logger = logging.getLogger("jax._src.compilation_cache")
    _cache_logger.setLevel(logging.DEBUG)
    _cache_logger.addFilter(_CacheCounter())
    print(f"# bench: compile cache at {cache_dir}", file=sys.stderr,
          flush=True)

    sys.path.insert(0, "tests")
    from synthetic_scene import BallCloudScene, BallScene

    from cednerf_tpu.engine.cli import build_field
    from cednerf_tpu.engine.config import ModelFlags, dnerf_config, dynerf_config
    from cednerf_tpu.engine.train import Trainer

    # Flagship flags (the published combination -te -ta -f -ae -df -d).
    flags = ModelFlags(
        use_div_offsets=True, use_feat_predict=True, use_time_embedding=True,
        use_time_attenuation=True, distortion_loss=True, acc_entropy_loss=True,
    )
    cfg = (dnerf_config if args.shape == "dnerf" else dynerf_config)(
        max_steps=100000)
    overrides = _load_overrides()
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
        # json.dumps, not repr — tools/pick_bench_defaults.py parses this
        # line back, and Python's True/False aren't valid JSON
        print(f"# bench: cfg overrides {json.dumps(overrides)}",
              file=sys.stderr, flush=True)
    field = build_field(cfg, flags)
    # dense dynamic scene: ~50% of rays hit geometry, tens of samples/ray in
    # steady state — comparable per-ray load to the reference's real captures.
    # CEDNERF_BENCH_SCENE=ball swaps in the opaque short-span BallScene (the
    # shrink-from-full steady-march A/B arm — VERDICT r4 weak #5: the bench
    # scene's occupied span leaves no shrink to take, so the empty-space-skip
    # lever needs a short-span scene to show its value).
    scene_name = os.environ.get("CEDNERF_BENCH_SCENE", "cloud")
    scene_cls = BallScene if scene_name == "ball" else BallCloudScene
    scene = scene_cls(n_cams=8, wh=128, n_times=8)

    if args.shape == "dynerf":
        # real-dataset shape: batches assembled on the host (like the DyNeRF
        # ISG/IST loader's native sampler) and double-buffered into the
        # scanned loop — measures sampling overlap, not just device compute
        trainer = Trainer(field, cfg, flags, scene, seed=0,
                          stacked_host=True, steps_per_call=32)
    else:
        trainer = Trainer(field, cfg, flags, scene, seed=0,
                          device_sampler=scene.device_sampler(),
                          steps_per_call=32)

    def log(m):
        print(f"# step={trainer.step} loss={m['loss']:.4f} "
              f"rays={m['num_rays']} nsamp={int(m['n_samples'])} "
              f"demand={int(m.get('n_valid', 0))} "
              f"cf={m.get('complete_frac', 1.0):.3f}",
              file=sys.stderr, flush=True)

    def run_ttq(ttq_field, ttq_cfg, ttq_scene, label,
                threshold_db: float = 30.0, steps_per_call: int = 32):
        # seconds-to-quality from a cold start, compile included — the
        # number a user actually waits for (reference contract shape,
        # run_hyper.sh:3,6,9,12). The adaptive shape machinery (bucket +
        # steady-march auto-repair) stays LIVE — this measures the
        # production trainer, quality-complete by construction.
        ttq_tr = Trainer(ttq_field, ttq_cfg, flags, ttq_scene, seed=0,
                         device_sampler=ttq_scene.device_sampler(),
                         steps_per_call=steps_per_call)
        t0 = time.perf_counter()
        t_hit = None
        m = {}
        while ttq_tr.step < 20000:
            m = ttq_tr.run_chunk()
            if float(m["psnr"]) >= threshold_db:
                t_hit = time.perf_counter() - t0
                break
            if ttq_tr.step % 512 == 0:
                print(f"# ttq[{label}] step={ttq_tr.step} "
                      f"psnr={float(m['psnr']):.2f} "
                      f"cf={m.get('complete_frac', 1.0):.3f}",
                      file=sys.stderr, flush=True)
        if t_hit is not None:
            print(f"# ttq[{label}]: {threshold_db:g} dB at {t_hit:.1f}s "
                  f"(step {ttq_tr.step}, cf="
                  f"{m.get('complete_frac', 1.0):.3f})",
                  file=sys.stderr, flush=True)
        return t_hit, ttq_tr.step

    if args.metric == "time_to_30db":
        t_hit, _ = run_ttq(field, cfg, scene, "bench")
        if t_hit is None:
            print(json.dumps({"metric": "time_to_30db", "value": -1,
                              "unit": "s", "vs_baseline": 0.0}))
            return
        print(json.dumps({
            "metric": "time_to_30db", "value": round(t_hit, 1), "unit": "s",
            "vs_baseline": round(425.14 / t_hit, 3),
        }))
        return

    # Default run = BOTH contracts in one JSON line (VERDICT r3 next #3):
    # seconds-to-quality first (cold start, compile included — it also
    # pre-warms every train program for the throughput phase), then the
    # settled samples/s windows. CEDNERF_BENCH_SKIP_TTQ=1 skips the TTQ
    # phases for quick A/B arms.
    #
    # TWO TTQ rows (VERDICT r4 weak #3 — provenance): the bench-default
    # row trains the BENCH scene (volumetric BallCloudScene) at the bench
    # overrides, while the repo's TTQ number of record (docs/QUALITY.md,
    # tools/validate_synthetic --ttq_db) trains the opaque BALL scene at
    # the preset defaults — a ~2.5x easier target (surface scene, 30 dB at
    # step ~256 vs ~1024 on the cloud). Both are emitted so neither can be
    # mistaken for the other.
    ttq_s = ttq_step = None
    ttq_ball_s = ttq_ball_step = None
    # CEDNERF_BENCH_TTQ_DB overrides the threshold (validation/warm runs
    # only — the driver's artifact uses the default 30)
    ttq_db = float(os.environ.get("CEDNERF_BENCH_TTQ_DB", "30"))
    if (args.shape == "dnerf"
            and os.environ.get("CEDNERF_BENCH_SKIP_TTQ") != "1"):
        ttq_s, ttq_step = run_ttq(field, cfg, scene, "bench",
                                  threshold_db=ttq_db)
        from synthetic_scene import BallScene

        record_cfg = dnerf_config(max_steps=100000)
        record_field = build_field(record_cfg, flags)
        ttq_ball_s, ttq_ball_step = run_ttq(
            record_field, record_cfg, BallScene(n_cams=8, wh=128, n_times=8),
            "ball_record", threshold_db=ttq_db, steps_per_call=16)

    # Warmup: occupancy carving (warmup-loop program), then chunks of bucket
    # + steady-lattice adaptation. The ADAPTATIONS STAY LIVE through the
    # settle phase so the timed windows measure the SETTLED shape — with
    # the lattice pinned at the configured value, the 1M-budget default
    # ran at complete_frac ~0.5 (half the rays loss-masked; a throughput
    # number on a quality-broken shape is not a number, r3s25
    # ttq_bench_30db log). Shapes freeze after settle: one cached program
    # per timed window.
    t_start = time.perf_counter()
    trainer.adapt_steady = True
    while trainer.step < 320:
        log(trainer.run_chunk())
    while trainer.step < 384:
        log(trainer.run_chunk())
    print(f"# warmup+compile done in {time.perf_counter() - t_start:.0f}s "
          f"(persistent-cache misses: {cache_events['writes']}, "
          f"hits: {cache_events['hits']})",
          file=sys.stderr, flush=True)
    # Settle: the first window after compilation measures ~30% slow on the
    # tunneled chip (frequency/JIT ramp); run untimed steps until the cached
    # program reaches steady state (and the adaptive shapes converge).
    settle_end = trainer.step + 160
    while trainer.step < settle_end:
        m = trainer.run_chunk()
    trainer.adapt_bucket = False
    trainer.adapt_steady = False
    print(f"# settled shape: rays={trainer.bucket} "
          f"steady_march={trainer.steady_march} "
          f"cf={m.get('complete_frac', 1.0):.3f}",
          file=sys.stderr, flush=True)
    # the last settle chunk may have adapted the shape — run a few frozen
    # chunks so window 0 never pays a compile (observed: 2.13M vs 3.24M
    # windows when it did, results/r3s25/bench_l4f8_ftr131k)
    for _ in range(3):
        trainer.run_chunk()

    # Timed run: mean over two windows (sustained throughput; best-of was
    # rejected as systematically optimistic — ADVICE r1).
    # block_until_ready does not synchronize through remote TPU
    # attachments — fetch a metric scalar to the host instead.
    bench_steps = 320
    rates = []
    for window in range(2):
        total_samples = 0
        steps_done = 0
        t0 = time.perf_counter()
        while steps_done < bench_steps:
            m = trainer.run_chunk()  # run_chunk fetches metrics -> host sync
            total_samples += int(m["n_samples"]) * int(m["steps"])
            steps_done += int(m["steps"])
        elapsed = time.perf_counter() - t0
        rates.append(total_samples / elapsed)
        print(f"# window {window}: {total_samples / elapsed:.0f} samples/s",
              file=sys.stderr, flush=True)
    samples_per_sec = sum(rates) / len(rates)
    suffix = "" if args.shape == "dnerf" else f"_{args.shape}"
    out = {
        "metric": "train_samples_per_sec" + suffix,
        "value": round(samples_per_sec, 1),
        "unit": "samples/s",
        "vs_baseline": round(samples_per_sec / BASELINE_SAMPLES_PER_SEC, 3),
        # quality-completeness provenance of the timed windows (a number
        # measured at cf < 1 is a number on a loss-masked shape)
        "complete_frac": round(float(m.get("complete_frac", 1.0)), 3),
    }
    if ttq_s is not None:
        # the reference's own published contract shape: seconds-to-PSNR
        # (run_hyper.sh). `ttq_anchor_ratio` divides the reference's 425.14 s
        # vrig_3dprinter train time by ours as a SCALE ANCHOR ONLY — the
        # scenes differ (procedural vs real capture), so it is a
        # round-over-round unit, NOT a cross-codebase speedup claim.
        out["time_to_30db_s"] = round(ttq_s, 1)
        out["ttq_step"] = int(ttq_step)
        out["ttq_scene"] = "ballcloud@bench_defaults"
        out["ttq_anchor_ratio"] = round(425.14 / ttq_s, 3)
    if ttq_ball_s is not None:
        # the configuration of the repo's TTQ number of record
        # (docs/QUALITY.md r3s25: ball scene, preset defaults, 16-step
        # chunks) — directly comparable to that table
        out["time_to_30db_ball_s"] = round(ttq_ball_s, 1)
        out["ttq_ball_step"] = int(ttq_ball_step)
        out["ttq_ball_scene"] = "ball@preset_defaults"
    print(json.dumps(out))


if __name__ == "__main__":
    main()
