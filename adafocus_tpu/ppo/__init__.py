from adafocus_tpu.ppo.core import (
    PPOConfig,
    PPOState,
    compute_rewards,
    discounted_returns,
    evaluate_episode,
    make_policy,
    ppo_init,
    ppo_update,
)

__all__ = [
    "PPOConfig",
    "PPOState",
    "compute_rewards",
    "discounted_returns",
    "evaluate_episode",
    "make_policy",
    "ppo_init",
    "ppo_update",
]
