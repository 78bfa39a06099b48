"""Data layer: video record parsing, TSN segment sampling, on-device
augmentation, and the host input pipeline.

TPU-native redesign of the reference data stack (/root/reference,
actnet/ops/dataset.py + ops/transforms.py + sthsth/ops/dataset.py): JPEG
decode happens on host threads into fixed-shape uint8 canvases; every
augmentation that the reference runs per-frame in PIL worker processes
(multi-scale crop, scale, center crop, flip, normalize) runs batched on
device inside the training jit program instead.
"""

from adafocus_tpu.data.records import (  # noqa: F401
    DatasetSpec,
    VideoRecord,
    dataset_registry,
    parse_list_file,
    return_dataset,
)
from adafocus_tpu.data.sampling import (  # noqa: F401
    sample_segment_indices,
    sample_dual_rate,
)
from adafocus_tpu.data.transforms import (  # noqa: F401
    AugmentConfig,
    augment_train,
    augment_eval,
    normalize,
)
from adafocus_tpu.data.pipeline import (  # noqa: F401
    LoaderConfig,
    VideoLoader,
    SyntheticVideoSource,
    FrameFolderSource,
)
