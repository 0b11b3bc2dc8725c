from amazon_personalize_connectors_spark.sources.readers import (
    BATCH_INFERENCE_RELATED_SCHEMA,
    BATCH_INFERENCE_USERPERS_SCHEMA,
    path_exists,
    read_batch_inference,
    read_item_metadata,
    read_last_sync_state,
    read_user_item_mapping,
    split_corrupt,
)

__all__ = [
    "BATCH_INFERENCE_RELATED_SCHEMA",
    "BATCH_INFERENCE_USERPERS_SCHEMA",
    "path_exists",
    "read_batch_inference",
    "read_item_metadata",
    "read_last_sync_state",
    "read_user_item_mapping",
    "split_corrupt",
]
