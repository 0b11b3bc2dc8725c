"""amazon_personalize_connectors_spark — a PySpark-native analytics engine
re-expressing the query semantics of aws-samples/amazon-personalize-connectors.

The reference (/root/reference) is an AWS Glue 3.0 + Lambda connector
framework; this library re-implements its full data-processing surface as
idiomatic, cloud-agnostic PySpark: DataFrame/Catalyst end-to-end, zero
Python UDFs in the relational core, connector delivery as pluggable sinks,
and incremental ("job bookmark") semantics as Structured Streaming
Trigger.AvailableNow + checkpoints.

See SURVEY.md §2 for the operator inventory this package covers.
"""

__version__ = "0.1.0"

from amazon_personalize_connectors_spark.config import ConnectorConfig, PipelineConfig
from amazon_personalize_connectors_spark.session import get_spark

__all__ = ["ConnectorConfig", "PipelineConfig", "get_spark", "__version__"]
