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
