"""CLI flag plumbing: parser -> SceneConfig -> field encoder spec.

The reference drives everything through opt.py flags (train_real.py:24-90);
this checks our added perf knobs actually reach the encoder spec that the
jitted programs key their behavior on.
"""

from cednerf_tpu.engine.cli import (apply_perf_overrides, build_field,
                                    flags_from_args, get_model_args)
from cednerf_tpu.engine.config import dnerf_config


def _parse(argv):
    import argparse
    return get_model_args(argparse.ArgumentParser()).parse_args(argv)


def test_perf_overrides_reach_field_spec():
    args = _parse(["-te", "-ta", "-f", "--sample_budget", "524288",
                   "--scatter_impl", "fused", "--interp_impl", "pallas"])
    cfg = apply_perf_overrides(dnerf_config(max_steps=100), args)
    assert cfg.target_sample_batch_size == 524288
    assert cfg.scatter_impl == "fused"
    assert cfg.interp_impl == "pallas"
    field = build_field(cfg, flags_from_args(args))
    assert field.scatter_impl == "fused"
    assert field.interp_impl == "pallas"
    bspec = field.hash_spec
    assert bspec.scatter_impl == "fused"
    assert bspec.interp_impl == "pallas"


def test_perf_overrides_default_noop():
    args = _parse(["-te"])
    cfg = dnerf_config(max_steps=100)
    assert apply_perf_overrides(cfg, args) is cfg
