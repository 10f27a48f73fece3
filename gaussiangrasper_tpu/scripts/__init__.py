"""CLI package. GGT_PLATFORM=cpu|tpu overrides the JAX platform for every
tool (the axon TPU plugin in some images overwrites JAX_PLATFORMS at
import time, so plain env vars don't stick — this hook applies the choice
via jax.config after import)."""

import os

if os.environ.get("GGT_PLATFORM"):
    import jax

    jax.config.update("jax_platforms", os.environ["GGT_PLATFORM"])
