from axolotls_spark.multimodal.ops import (  # noqa: F401
    MEDIA_META_SCHEMA,
    ahash64,
    attach_payload,
    audio_activity,
    byte_count_histogram,
    byte_histogram_features,
    decode_media,
    entropy_ahash_pass,
    frame_sample,
    resize_images,
    scene_changes,
    tile_grid,
)
