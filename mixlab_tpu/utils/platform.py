"""Platform selection helper.

Some environments force-register accelerator backends from sitecustomize and
override ``JAX_PLATFORMS`` (this machine's axon TPU tunnel does).  Entry
points call :func:`apply_env_platform` so an explicit ``JAX_PLATFORMS`` from
the user's environment wins regardless.
"""

from __future__ import annotations

import os


def apply_env_platform():
    want = os.environ.get("JAX_PLATFORMS")
    if want:
        import jax

        try:
            jax.config.update("jax_platforms", want)
        except Exception:
            pass
