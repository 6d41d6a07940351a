"""Column-expression function library (JVM-side, codegen-friendly)."""

from arachne_spark.functions.ids import (  # noqa: F401
    KINDS,
    PREFIX_FOR_KIND,
    entity_root,
    identify,
    is_valid_id,
    normalize,
)
