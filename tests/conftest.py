"""Test harness: run everything on a virtual 8-device CPU mesh.

The environment's axon TPU plugin force-sets JAX_PLATFORMS=axon at
interpreter startup, so the env var alone is not enough — we must also
update jax.config before any backend is initialized.
"""
import os

# PT_TESTS_TPU=1 runs the suite on the real TPU instead of the virtual
# CPU mesh (needed for the pallas megakernel parity tests, which have no
# CPU lowering).
if os.environ.get("PT_TESTS_TPU") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")

    assert jax.devices()[0].platform == "cpu"


# ---------------------------------------------------------------------------
# slow-test profile (VERDICT r2 #8): tests measured >20 s on the CI box are
# marked `slow` and excluded by the default `-m "not slow"` (pyproject).
# Full profile (CI/nightly): pytest -m 'slow or not slow'
# Regenerate the list from: pytest -q --durations=60 -m 'slow or not slow'
# ---------------------------------------------------------------------------
import pytest  # noqa: E402

_SLOW_TESTS = {
    # test_grad_pallas (interpret-mode differentiable megakernel)
    "test_sharded_megakernel_step_matches_single_device",
    "test_tri_grad_fd_cpu_interpret",
    "test_tex_grad_fd_cpu_interpret",
    "test_tex_grad_multiwindow_fd_cpu_interpret",
    "test_obj_grad_fd_cpu_interpret",
    "test_step_descends_cpu_interpret",
    "test_sharded_megakernel_step_descends_cpu_mesh",
    "test_tri_grad_batched_spp_fd_cpu_interpret",
    "test_tri_grad_onehot_matches_tape",
    # training / gradients
    "test_train_demo_recovers_colors",
    "test_sharded_train_step_optax",
    "test_train_state_checkpoint_roundtrip",
    "test_grad_color_finite_difference",
    "test_sharded_train_step",
    "test_grad_exists_and_matches_finite_difference",
    "test_train_step_descends",
    # distributed drivers
    "test_render_sharded_pallas_textured",
    "test_driver_with_mesh_checkpoint_resume",
    "test_driver_with_mesh_matches_local_statistically",
    "test_driver_with_mesh_recovers_from_fault",
    "test_two_process_cluster_matches_single_process",
    # interpret-mode megakernel parity
    "test_coherent_variance_parity",
    "test_megakernel_mip_staged_large_texture",
    "test_textured_megakernel_matches_wavefront[textures-32-0.04]",
    "test_textured_megakernel_matches_wavefront[cubemap-16-0.04]",
    "test_octant_copy_parity",
    "test_render_sharded_pallas_cpu_mesh",
    "test_render_sharded_pallas_mxu_cpu_mesh",
    "test_megakernel_mxu_matches_classic_cpu_interpret",
    "test_megakernel_spp_pack_same_estimator",
    "test_teapot_golden",
    "test_scene_goldens[textures]",
    "test_megakernel_nee_multi_light",
    "test_megakernel_nee_mesh_scene",
    "test_megakernel_nee_matches_wavefront_statistically",
    "test_oracle_image_convergence[default]",
    # driver / CLI
    "test_checkpoint_resume_bit_identical",
    "test_fault_recovery_identical_output",
    "test_render_with_profile_and_debug_ray",
}


def pytest_collection_modifyitems(config, items):
    for item in items:
        if item.name in _SLOW_TESTS:
            item.add_marker(pytest.mark.slow)
