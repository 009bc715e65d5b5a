"""CLI jax-backend override shared by every entry point.

On this class of host a site hook imports jax with the TPU ('axon')
platform baked in, and it re-forces that platform at backend init — the
JAX_PLATFORMS environment variable is swallowed, so the only reliable
override is config-level (jax.config.update BEFORE first device use).
These helpers give every CLI a uniform `--platform {auto,cpu,tpu,axon}`
flag so the full toolchain runs on TPU-less hosts (or while a TPU
tunnel is down) with `--platform cpu`.
"""


def add_platform_arg(parser) -> None:
    parser.add_argument(
        '--platform', default='auto',
        choices=['auto', 'cpu', 'tpu', 'axon'],
        help="jax backend override ('cpu' runs without TPU hardware). "
             "Applied via jax.config — the JAX_PLATFORMS env var is "
             "overridden by site hooks on some hosts")


def apply_platform(platform: str) -> None:
    """Apply the --platform choice. Must run before any jax device use
    (incl. jax.distributed.initialize)."""
    if platform and platform != 'auto':
        import jax
        jax.config.update('jax_platforms', platform)
