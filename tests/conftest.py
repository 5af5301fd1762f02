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
