from .codec import (  # noqa: F401
    decode_image,
    encode_image,
    phash64,
    phash_to_int64,
    psnr,
)
from .images import (  # noqa: F401
    GenerateImagesBatch,
    cached_images_parquet,
    images_dataset,
    images_table,
    truth_pairs,
)
