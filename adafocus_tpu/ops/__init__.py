from adafocus_tpu.ops.patch import (
    extract_patches,
    extract_patches_flat,
    pad_for_extraction,
    patch_offsets,
    random_patch_actions,
)

__all__ = [
    "extract_patches",
    "extract_patches_flat",
    "pad_for_extraction",
    "patch_offsets",
    "random_patch_actions",
]
