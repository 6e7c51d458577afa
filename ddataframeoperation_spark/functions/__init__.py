from ddataframeoperation_spark.functions.schema import (
    schema_from_metadata,
    metadata_from_schema,
)

__all__ = ["schema_from_metadata", "metadata_from_schema"]
