"""Root conftest: force tests onto a virtual 8-device CPU mesh.

The reference had no distributed test harness at all (SURVEY.md §4); we use
XLA's host-platform device multiplexing as the TPU-native "fake backend" so
multi-chip sharding is exercised in every CI run without real hardware.
"""

import os

# Unconditional: the ambient environment may point JAX at a tunneled TPU
# (JAX_PLATFORMS=axon); unit tests must run on the virtual CPU mesh. The
# axon PJRT plugin ignores the env var, so also force it via jax.config.
os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# Persistent compilation cache: the suite's 12-18 min is mostly jit
# compiles of programs that do not change between runs; cached reruns cut
# that substantially. Keyed by HLO hash, so code changes re-compile.
# (jax 0.9 ignores the JAX_COMPILATION_CACHE_DIR env var — the explicit
# config update is required.)
jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/lam_slide_jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

# ---------------------------------------------------------------------------
# Two-tier suite: `pytest -m "not slow"` is the fast tier (< 5 min on the
# 8-device CPU mesh). Tests measured > ~5 s (warm compile cache,
# 2026-08-19 durations run) carry the slow marker, assigned centrally here
# so test files stay unmarked and the list is auditable in one place.
# ---------------------------------------------------------------------------

_SLOW_MODULES = {
    "test_sweeps.py",          # multi-process sweep fan-out (~90 s)
    "test_multihost.py",       # real 2-process gloo distributed run
    "test_tp.py",              # tensor-parallel train/ckpt on the 8-dev mesh
    "test_ring_attention.py",  # shard_map ring grads on a 2x4 mesh
}

_SLOW_TESTS = {
    "test_peptide.py::TestPeptideStage2::test_loss_and_sampling",
    "test_peptide.py::TestPeptideStage1::test_trains_and_metrics",
    "test_peptide.py::TestPeptideDataset::test_precompute_shapes",
    "test_train.py::test_cli_test_only_from_checkpoint",
    "test_train.py::test_cli_test_protocol_fp32_on_test_split",
    "test_second_stage.py::test_second_stage_train_and_grads_skip_first_stage",
    "test_second_stage.py::test_class_conditional_and_k_sampling",
    "test_second_stage.py::test_k_chunk_matches_vmapped",
    "test_protein_io.py::test_md17_protocol_on_mesh_matches_single_device",
    "test_protein_io.py::test_md17_test_protocol_runner",
    "test_analysis.py::test_sampling_hook",
    "test_pedestrian_nba.py::TestStage2Protocols::test_pedestrian_second_stage_fpc",
    "test_pedestrian_nba.py::TestStage2Protocols::test_nba_second_stage_smoke",
    "test_pedestrian_nba.py::TestStage1Losses::test_pedestrian_trains",
    "test_pedestrian_nba.py::TestStage1Losses::test_nba_loss_and_metrics",
    "test_models.py::TestLatentDiT::test_grad_flows",
    "test_models.py::TestLatentDiT::test_output_shape_and_zero_init",
    "test_models.py::TestScanLayers::test_matches_unrolled",
    "test_models.py::TestScanLayers::test_remat_scan_equal_and_grads_flow",
    "test_models.py::TestScanLayers::test_bf16_scan_traces",
    "test_packed_attention.py::TestHeadMajorNormRope::test_model_knob_grad_parity",
    "test_first_stage_md17.py::test_first_stage_smoke_train",
    "test_fused_adaln.py::test_dit_layer_uses_fused_path_and_matches",
    "test_fused_spatial.py::test_gradients_match_unfused",
    "test_real_formats.py::test_process_4aa_tool",
    "test_real_formats.py::test_peptide_npz_pdb_roundtrip",
    "test_eval_pipeline.py::test_rollout_sampler",
    "test_torch_parity.py::test_latent_dit_matches_torch",
    "test_flash_normrope.py::TestGradientParity::test_grads_multi_block",
    "test_transport.py::test_dopri5_matches_scipy_on_dit_drift",
    "test_torch_parity.py::test_encoder_matches_torch",
    "test_fused_spatial.py::test_dit_spatial_path_uses_fused_and_matches",
    "test_models.py::TestEncoder::test_shapes",
    "test_models.py::TestLatentDiT::test_checkpointing_same_output",
    "test_flash_normrope.py::TestGradientParity::test_grads_match_composition",
    "test_fused_temporal.py::test_gradients_match",
    "test_first_stage_md17.py::test_first_stage_data_parallel_mesh",
    "test_second_stage.py::test_sampling_shapes_and_determinism",
    "test_reference_formats.py::test_nba_fixture_through_reference_process_data",
    "test_flash_attention.py::TestPackedLayout::test_grads_match_headmajor",
    "test_measure_tools.py::test_measure_trained_nfe_on_smoke_run",
    "test_eval_pipeline.py::test_batched_rollout_matches_serial_at_b1",
}


def pytest_collection_modifyitems(config, items):
    import pytest

    slow = pytest.mark.slow
    for item in items:
        fname = item.nodeid.split("::", 1)[0].rsplit("/", 1)[-1]
        rel = f"{fname}::{item.nodeid.split('::', 1)[1]}" if "::" in item.nodeid else fname
        # parametrized ids: strip the [param] suffix for set membership
        base = rel.split("[", 1)[0]
        if fname in _SLOW_MODULES or base in _SLOW_TESTS:
            item.add_marker(slow)
