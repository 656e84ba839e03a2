"""Test configuration: run everything on CPU with 8 virtual devices so
multi-chip sharding is exercised without TPU hardware (SURVEY.md §4/§7).

jax.config is used (not env vars) because this environment's sitecustomize
force-registers a TPU platform plugin regardless of JAX_PLATFORMS.
"""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
