"""SparkSession builders with scale-tuned configuration."""

from incident_pii_redactor_spark.plans.session import (
    build_session,
    scan_parallelism_floor,
)

__all__ = ["build_session", "scan_parallelism_floor"]
