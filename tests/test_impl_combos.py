"""One train step through each perf-impl combination.

Guards the cross-product the TPU sweeps rely on: segment marching x
Pallas scatter/fused-backward x Pallas interpolation must all compose
with the packed renderer and produce the same loss as the XLA baseline
(same math, bf16-accum reorder noise only).
"""

import dataclasses
import sys

import jax
import jax.numpy as jnp
import pytest

sys.path.insert(0, "tests")

from synthetic_scene import BallScene
from cednerf_tpu.engine.cli import build_field
from cednerf_tpu.engine.config import ModelFlags, dnerf_config
from cednerf_tpu.engine.train import create_train_state, make_train_step

FLAGS = ModelFlags(use_div_offsets=True, use_feat_predict=True,
                   use_time_embedding=True, use_time_attenuation=True,
                   distortion_loss=True, acc_entropy_loss=True)


def _loss(scat, interp, seg, compact="xla", row_layout="brick"):
    cfg = dataclasses.replace(
        dnerf_config(max_steps=64), target_sample_batch_size=4096,
        grid_resolution=16, render_step_size=2e-2, max_march_steps=128,
        occ_warmup_steps=8, occ_update_interval=4,
        scatter_impl=scat, interp_impl=interp, march_seg=seg,
        compact_impl=compact, row_layout=row_layout)
    field = dataclasses.replace(build_field(cfg, FLAGS), dst_resolution=128)
    scene = BallScene(n_cams=4, wh=32, n_times=4)
    key = jax.random.PRNGKey(0)
    state = create_train_state(field, cfg, key)
    data, sample_fn = scene.device_sampler()
    batch = jax.jit(lambda d, k: sample_fn(d, k, 64))(data, key)
    step = make_train_step(field, cfg, FLAGS, use_seg=seg > 0)
    _, metrics = step(state, batch, key)
    return float(metrics["loss"])


@pytest.mark.parametrize("scat,interp,seg,compact", [
    ("fused", "pallas", 8, "pallas"),
    ("pallas", "xla", 0, "pallas"),
    ("xla", "xla", 0, "rayfold"),
    ("fused", "dma", 0, "xla"),
])
def test_impl_combo_matches_xla_baseline(scat, interp, seg, compact):
    ref = _loss("xla", "xla", seg)
    got = _loss(scat, interp, seg, compact)
    assert abs(got - ref) < 1e-3 * max(abs(ref), 1.0), (got, ref)


@pytest.mark.parametrize("layout", ["cell", "cellfused"])
def test_row_layout_combo_matches_brick_baseline(layout):
    ref = _loss("xla", "xla", 0, row_layout="brick")
    got = _loss("xla", "xla", 0, row_layout=layout)
    assert abs(got - ref) < 1e-3 * max(abs(ref), 1.0), (got, ref)
