"""Pipeline configuration — the reference's entire "query language".

Mirrors sample/config.json (reference sample/config.json:1-14) and the
validation performed at related_items_etl.py:72-88. Two divergences,
both deliberate (SURVEY.md §7.4):

* ``performDeltaCheck`` is accepted at the top level (as the sample
  config and README.md:124 document) *and* as a per-connector override
  (as the reference code actually reads it, related_items_etl.py:243).
  As shipped, the reference sample config never triggers the delta; we
  honor both spellings.
* the run timestamp is an explicit parameter (reference grabs
  ``datetime.now()`` at import, related_items_etl.py:36), keeping plans
  deterministic and testable.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from datetime import datetime, timezone
from typing import Any

DEFAULT_ATTRIBUTE_PREFIX = "recommendation_"  # braze_dequeue_function/main.py:72


class ConfigError(ValueError):
    """Raised when a pipeline config fails validation (ri:79-88)."""


@dataclass(frozen=True)
class ConnectorConfig:
    """One entry of the ``connectors`` map (sample/config.json:6-13)."""

    name: str
    item_metadata_fields: tuple[str, ...] = ()  # empty → all fields (ri:195-200)
    attribute_prefix: str = DEFAULT_ATTRIBUTE_PREFIX
    other_attributes: dict[str, str] = field(default_factory=dict)
    perform_delta_check: bool | None = None  # per-connector override (ri:243)
    # delivery-side cap: keep only the top-N recommendations per query
    # entity (rank order preserved). None → deliver everything the
    # batch inference produced. An engine addition to the reference's
    # config family (README.md:118-131) — destinations routinely want
    # fewer slots than the inference job's num-results.
    max_recommendations: int | None = None

    @classmethod
    def from_dict(cls, name: str, raw: dict[str, Any]) -> "ConnectorConfig":
        fields_raw = raw.get("itemMetadataFields", [])
        if isinstance(fields_raw, str):  # reference accepts comma-joined strings
            fields_raw = fields_raw.split(",")
        max_recs = raw.get("maxRecommendations")
        if max_recs is not None:
            if isinstance(max_recs, bool) or not isinstance(max_recs, int) or max_recs < 1:
                raise ConfigError(
                    f"connector {name!r}: maxRecommendations must be a "
                    f"positive integer, got {max_recs!r}"
                )
        return cls(
            name=name,
            # strip whitespace per ri:198
            item_metadata_fields=tuple(f.strip() for f in fields_raw if f and f.strip()),
            attribute_prefix=raw.get("attributePrefix", DEFAULT_ATTRIBUTE_PREFIX),
            other_attributes=dict(raw.get("otherAttributes", {})),
            perform_delta_check=raw.get("performDeltaCheck"),
            max_recommendations=max_recs,
        )


@dataclass(frozen=True)
class PipelineConfig:
    """Top-level pipeline config (sample/config.json:1-14)."""

    batch_inference_path: str
    connectors: tuple[ConnectorConfig, ...]
    perform_delta_check: bool = False
    save_batch_inference_errors: bool = False
    job_name: str = "apc-spark-job"
    run_datetime: datetime = field(
        default_factory=lambda: datetime(2026, 1, 1, tzinfo=timezone.utc)
    )

    @classmethod
    def from_dict(cls, raw: dict[str, Any], **overrides: Any) -> "PipelineConfig":
        if "batchInferencePath" not in raw:
            raise ConfigError("config missing required field 'batchInferencePath'")
        connectors_raw = raw.get("connectors")
        if not connectors_raw or not isinstance(connectors_raw, dict):
            raise ConfigError("config requires a non-empty 'connectors' map")
        connectors = tuple(
            ConnectorConfig.from_dict(name, conn or {})
            for name, conn in connectors_raw.items()
        )
        kwargs: dict[str, Any] = dict(
            batch_inference_path=raw["batchInferencePath"],
            connectors=connectors,
            perform_delta_check=bool(raw.get("performDeltaCheck", False)),
            save_batch_inference_errors=bool(raw.get("saveBatchInferenceErrors", False)),
        )
        kwargs.update(overrides)
        return cls(**kwargs)

    @classmethod
    def from_json(cls, text: str, **overrides: Any) -> "PipelineConfig":
        return cls.from_dict(json.loads(text), **overrides)

    def delta_enabled(self, connector: ConnectorConfig) -> bool:
        """Top-level flag with per-connector override (SURVEY.md §7.4)."""
        if connector.perform_delta_check is not None:
            return bool(connector.perform_delta_check)
        return self.perform_delta_check
