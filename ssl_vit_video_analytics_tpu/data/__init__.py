from .splits import read_split, write_split, make_class_shard_splits, train_val_test_split
from .frames import (
    JpegFolderStore, PackedFolderStore, make_store, pack_frame_dir,
    IMAGENET_MEAN, IMAGENET_STD,
)
from .loader import ClipDataset, iterate_batches, prefetch_to_device, sample_frame_indices
from .masking import (
    get_mask_ratio, make_token_mask, random_token_mask, tube_token_mask,
    get_tube_mask, frame_mask, count_masked, count_visible,
)
from .fixtures import make_synthetic_dataset, make_synthetic_faces
