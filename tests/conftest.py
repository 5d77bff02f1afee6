"""Test harness: force an 8-virtual-device CPU platform.

Sharding correctness is checked against a fake multi-device CPU mesh
(xla_force_host_platform_device_count), so no real TPU pod is needed.

Note: this machine's sitecustomize registers the TPU PJRT plugin at
interpreter startup and pins JAX_PLATFORMS in the environment, so env vars
alone are not enough — we override platform selection via jax.config before
any backend is initialized (backends init lazily on first use).
"""

import os

if os.environ.get("PSGSDF_TEST_TPU", "") == "1":
    # run against the real accelerator (the TPU-gated goldens in
    # test_goldens.py need this: PSGSDF_TEST_TPU=1 python -m pytest
    # tests/test_goldens.py -q); everything CPU-mesh-dependent will skip
    # or run single-device
    import jax
else:
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)

    assert jax.default_backend() == "cpu", jax.default_backend()
    assert jax.device_count() >= 8, jax.devices()
