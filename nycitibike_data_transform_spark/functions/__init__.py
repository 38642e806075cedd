"""Column-function library — all Catalyst-native ``Column -> Column``.

The reference's extension mechanism is Jinja macros (compile-time SQL
templating, reference ``macros/``); the Spark-idiomatic equivalent is
plain Python functions that build Column expressions — zero runtime
cost, fully optimizable by Catalyst, and validated at plan-build time
(the analogue of dbt's ``raise_compiler_error``).
"""

from nycitibike_data_transform_spark.functions.dbt_compat import (
    date_spine,
    deduplicate,
    generate_surrogate_key,
    safe_divide,
    star,
)
from nycitibike_data_transform_spark.functions.decode import decode, payment_type_description
from nycitibike_data_transform_spark.functions.geo import haversine
from nycitibike_data_transform_spark.functions.text import (
    language_id,
    normalize_text,
    quality_score_columns,
    scrub_pii,
    text_fingerprint,
    token_count,
)
from nycitibike_data_transform_spark.functions.vectors import (
    cosine_similarity,
    dot_product,
    l2_norm,
)

__all__ = [
    "date_spine",
    "deduplicate",
    "generate_surrogate_key",
    "safe_divide",
    "star",
    "decode",
    "payment_type_description",
    "haversine",
    "normalize_text",
    "scrub_pii",
    "token_count",
    "language_id",
    "quality_score_columns",
    "text_fingerprint",
    "cosine_similarity",
    "dot_product",
    "l2_norm",
]
