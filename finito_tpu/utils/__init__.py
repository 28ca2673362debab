from finito_tpu.utils.logging import write_log, set_log_level, LogLevel, cur_time_micros


def configure_jax_platform():
    """Honor FINITO_JAX_PLATFORM (e.g. 'cpu') before any backend init.

    The environment's sitecustomize pins JAX_PLATFORMS to the TPU plugin,
    so subprocess tests and CPU-only utility runs need an explicit
    in-process override (same trick as tests/conftest.py)."""
    import os

    plat = os.environ.get("FINITO_JAX_PLATFORM")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
