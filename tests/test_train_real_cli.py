"""End-to-end drive of the shipped train_real.py CLI in a subprocess.

The reference's primary UX is `python train_real.py --data_root ... --scene
lego -te -ta -f -ae -df -d` followed by `--load_model --render_video`
(train_real.py:45-77, :523-558). Everything below runs the real argparse →
preset → loader → Trainer → eval → artifacts → checkpoint chain on a tiny
D-NeRF fixture with CEDNERF_CFG-shrunken shapes — the only code path not
covered by the in-process tests.
"""

import json
import os
import pathlib
import re
import subprocess
import sys

import pytest

from test_datasets import make_dnerf_fixture

REPO = pathlib.Path(__file__).resolve().parent.parent

TINY_CFG = {
    "target_sample_batch_size": 2048,
    "init_batch_size": 64,
    "grid_resolution": 16,
    "max_march_steps": 128,
    "render_step_size": 2e-2,
    "occ_warmup_steps": 8,
    "occ_update_interval": 4,
    "eval_s_max": 64,
    "eval_chunk": 256,
}


def _run_cli(args, cwd, timeout=900):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)  # block axon registration (tunnel)
    env["CEDNERF_CFG"] = json.dumps(TINY_CFG)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run(
        [sys.executable, str(REPO / "train_real.py")] + args,
        cwd=cwd, env=env, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    return proc.returncode, proc.stdout.decode()


@pytest.mark.slow
def test_train_real_cli_end_to_end(tmp_path):
    root = make_dnerf_fixture(str(tmp_path / "data"), scene="lego",
                              n_frames=3, wh=16)
    workdir = tmp_path / "run"
    workdir.mkdir()

    rc, out = _run_cli(
        ["--data_root", root, "--scene", "lego", "--max_steps", "48",
         "--ckpt_every", "0", "--model_path", str(tmp_path / "ckpt"),
         "-te", "-ta", "-f", "-ae", "-df", "-d"],
        cwd=workdir)
    assert rc == 0, out[-4000:]

    # the reference's eval contract: a printed summary + image artifacts
    m = re.search(r"evaluation: psnr_avg=([\d.]+), ssim_avg=", out)
    assert m, out[-4000:]
    assert float(m.group(1)) > 0.0
    for artifact in ["rgb_test.png", "depth_test.png", "rgb_error.png"]:
        assert (workdir / artifact).exists(), artifact
    assert (tmp_path / "ckpt").exists()

    # reload path: --load_model --render_video (train_real.py:523-558)
    # reload rebuilds the field from the flags, so the same model flags must
    # be passed (reference contract too: run_hyper.sh reuses the flag set;
    # mismatches fail loudly with named param shapes — ADVICE r1 #5)
    rc, out = _run_cli(
        ["--data_root", root, "--scene", "lego", "--load_model",
         "--render_video", "--model_path", str(tmp_path / "ckpt"),
         "-te", "-ta", "-f", "-ae", "-df", "-d"],
        cwd=workdir)
    assert rc == 0, out[-4000:]
    # (step count is quantized up to the scanned chunk size, so assert the
    # load happened rather than an exact step)
    assert re.search(r"loaded checkpoint at step \d+", out), out[-2000:]
    # write_video falls back to per-frame PNGs when no ffmpeg backend is
    # installed (utils/image.py:15-29) — accept either artifact form
    for stem in ["rgb_render", "depth_render"]:
        assert ((workdir / f"{stem}.mp4").exists()
                or (workdir / f"{stem}_0000.png").exists()), stem


@pytest.mark.slow
def test_train_real_cli_dynerf_family(tmp_path):
    """DyNeRF CLI path: ISG bootstrap, --mark_invisible frustum culling,
    --isg2ist_step switch (reference train_real.py:151-182, :205-211,
    dnerf_3d_video_IS.py:308)."""
    from test_datasets import make_dynerf_fixture

    root = make_dynerf_fixture(str(tmp_path / "data"), scene="cook_spinach",
                               n_cams=3, n_frames=4, wh=16)
    workdir = tmp_path / "run"
    workdir.mkdir()
    rc, out = _run_cli(
        ["--data_root", root, "--scene", "cook_spinach", "--max_steps", "32",
         "--ckpt_every", "0", "--model_path", str(tmp_path / "ckpt"),
         "--mark_invisible", "--isg2ist_step", "16", "-te", "-d", "-wr"],
        cwd=workdir)
    assert rc == 0, out[-4000:]
    assert re.search(r"evaluation: psnr_avg=([\d.]+)", out), out[-4000:]


@pytest.mark.slow
def test_train_real_cli_hypernerf_family(tmp_path):
    """HyperNeRF CLI path: vrig split, distortion cameras, one-image batches
    (reference train_real.py:119-149, hypernerf.py:456-461)."""
    from test_datasets import make_hypernerf_fixture

    root = make_hypernerf_fixture(str(tmp_path / "data"), scene="vrig_broom",
                                  n_imgs=6, wh=16)
    workdir = tmp_path / "run"
    workdir.mkdir()
    rc, out = _run_cli(
        ["--data_root", root, "--scene", "vrig_broom", "--max_steps", "32",
         "--ckpt_every", "0", "--model_path", str(tmp_path / "ckpt"),
         "-te", "-ta", "-f", "-ae", "-df", "-d"],
        cwd=workdir)
    assert rc == 0, out[-4000:]
    assert re.search(r"evaluation: psnr_avg=([\d.]+)", out), out[-4000:]


@pytest.mark.slow
def test_train_prop_real_cli_end_to_end(tmp_path):
    """Proposal-network CLI (the working equivalent of the reference's
    train_prop_real.py, whose sampler never ran — SURVEY §2a#2)."""
    root = make_dnerf_fixture(str(tmp_path / "data"), scene="lego",
                              n_frames=3, wh=16)
    workdir = tmp_path / "run"
    workdir.mkdir()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["CEDNERF_CFG"] = json.dumps({"eval_chunk": 256})
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    proc = subprocess.run(
        [sys.executable, str(REPO / "train_prop_real.py"),
         "--data_root", root, "--scene", "lego", "--max_steps", "16",
         "--num_rays", "64", "--model_path", str(tmp_path / "prop_ckpt"),
         "-te", "-d"],
        cwd=workdir, env=env, timeout=900,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    out = proc.stdout.decode()
    assert proc.returncode == 0, out[-4000:]
    assert re.search(r"evaluation: psnr_avg=([\d.]+)", out), out[-4000:]
    assert (workdir / "rgb_test.png").exists()
    # reference contract (train_prop_real.py:213,459,547): checkpoint saved
    # at end, restorable with --load_model, spiral video from the restore
    assert (tmp_path / "prop_ckpt").exists()
    proc = subprocess.run(
        [sys.executable, str(REPO / "train_prop_real.py"),
         "--data_root", root, "--scene", "lego", "--load_model",
         "--render_video", "--model_path", str(tmp_path / "prop_ckpt"),
         "-te", "-d"],
        cwd=workdir, env=env, timeout=900,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
    out = proc.stdout.decode()
    assert proc.returncode == 0, out[-4000:]
    assert re.search(r"loaded prop checkpoint at step \d+", out), out[-2000:]
    for stem in ["rgb_render", "depth_render"]:
        assert ((workdir / f"{stem}.mp4").exists()
                or (workdir / f"{stem}_0000.png").exists()), stem
