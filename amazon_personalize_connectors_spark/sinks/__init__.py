from amazon_personalize_connectors_spark.sinks.jsonl import (
    partitioned_output_path,
    write_connector_output,
    write_errors,
)

__all__ = ["partitioned_output_path", "write_connector_output", "write_errors"]
