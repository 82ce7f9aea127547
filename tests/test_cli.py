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
    # retired impls (pallas/dma/cellz/...) are config-only: the CLI lists
    # only live knobs (docs/TUNING.md "Retired knobs")
    args = _parse(["-te", "-ta", "-f", "--sample_budget", "524288",
                   "--scatter_impl", "fused", "--interp_impl", "xla",
                   "--max_table_rows", "32768",
                   "--fine_table_rows", "65536",
                   "--compact_impl", "rayfold"])
    cfg = apply_perf_overrides(dnerf_config(max_steps=100), args)
    assert cfg.target_sample_batch_size == 524288
    assert cfg.scatter_impl == "fused"
    assert cfg.interp_impl == "xla"
    assert cfg.max_table_rows == 32768
    assert cfg.fine_table_rows == 65536
    assert cfg.compact_impl == "rayfold"
    field = build_field(cfg, flags_from_args(args))
    assert field.scatter_impl == "fused"
    bspec = field.hash_spec
    assert bspec.scatter_impl == "fused"
    assert bspec.max_table_rows == 32768
    assert bspec.fine_table_rows == 65536
    # a 32768-row bf16 accumulator exceeds VMEM: the pallas route must
    # decline and fall back to the XLA path rather than Mosaic-OOM
    from cednerf_tpu.ops import brick_grid as bg
    bspec2 = bg.BrickGridSpec(
        n_levels=8, n_features=4, base_res=16, max_res=4096,
        log2_hashmap_size=21, max_table_rows=32768,
        grad_accum_dtype="bfloat16", interp_impl="pallas")
    assert not bg._pallas_route_ok(bspec2, 2048, bspec2.level_layout())


def test_perf_overrides_default_noop():
    args = _parse(["-te"])
    cfg = dnerf_config(max_steps=100)
    assert apply_perf_overrides(cfg, args) is cfg
