from diagan_tpu.score.score import (
    calculate_scores,
    clip_max_ratio,
    clip_min,
    ldr_conf_score,
    prepare_sample_weights,
    warn_if_degenerate_weights,
)

__all__ = [
    "calculate_scores",
    "clip_max_ratio",
    "clip_min",
    "ldr_conf_score",
    "prepare_sample_weights",
    "warn_if_degenerate_weights",
]
