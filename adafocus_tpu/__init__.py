"""adafocus_tpu: a TPU-native (JAX/XLA/Pallas/pjit) spatially-adaptive video
recognition framework with the capabilities of AdaFocus (ICCV'21).

Design (see SURVEY.md for the reference layer map this mirrors):
  - ``models``   : functional flax backbones (MobileNetV2, ResNet, TSM), policy
                   actor-critic nets, classifiers, and the GFV top-level model.
  - ``ops``      : TPU compute ops — Pallas patch-extraction kernel, consensus,
                   on-device image ops, metrics, analytic FLOPs accounting.
  - ``ppo``      : pure-functional PPO (discrete + continuous): scan rollouts,
                   clipped-surrogate updates.
  - ``data``     : TSN segment sampling, frame-folder datasets, registries.
  - ``parallel`` : mesh construction and sharding helpers (pjit/shard_map).
  - ``train``    : per-stage train/eval step functions, optimizers, recipes,
                   checkpointing (orbax).
  - ``cli``      : config + entry points.

Unlike the PyTorch reference (all stateful modules + per-sample host loops),
every train/eval step here is one jitted XLA program: glance -> policy scan ->
batched patch extraction -> focuser -> aggregate, with no host round-trips.
"""

__version__ = "0.1.0"


def enable_compilation_cache(cache_dir: str = "") -> None:
    """Turn on JAX's persistent compilation cache so repeated runs (bench
    sweeps, CLI restarts, the driver's checks) skip recompiles. First
    compiles through this environment's tunneled TPU take minutes, so this
    is a large quality-of-life lever; call before the first jit (and after
    any ``jax_platforms`` override — the decision is platform-keyed).

    The cache is NOT enabled when XLA:CPU is the PRIMARY platform:
    XLA:CPU cache entries are machine-code (AOT) artifacts whose embedded
    feature list includes tuning pseudo-features (``+prefer-no-scatter``,
    ``+prefer-no-gather``) that never match the host-feature check on
    reload — every warm run spams ``cpu_aot_loader ... could lead to
    execution errors such as SIGILL``, and an entry from a different
    machine genuinely can SIGILL. Measured here: even a cache written and
    re-read by the same process on the same machine trips the mismatch.
    CPU runs (virtual-mesh dryruns, debug) therefore always compile JIT.
    TPU compiles in the shared dir are serialized HLO keyed by backend, so
    they are unaffected.

    Only the FIRST platform in ``jax_platforms`` decides: in this
    environment the resolved list is ``"axon,cpu"`` (the runtime appends a
    CPU fallback), and a substring test against it silently disabled the
    cache for every TPU run — all big compiles (>1 s) in a TPU-primary
    process are TPU programs, while the hazardous XLA:CPU AOT entries come
    from CPU-primary processes (``JAX_PLATFORMS=cpu`` dryruns/tests),
    which this guard still excludes."""
    import os

    import jax

    try:
        platforms = jax.config.jax_platforms or ""
    except AttributeError:
        platforms = ""
    if platforms.split(",")[0].strip() == "cpu":
        return
    path = cache_dir or os.environ.get(
        "JAX_COMPILATION_CACHE_DIR",
        os.path.expanduser("~/.cache/adafocus_tpu/xla"),
    )
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
