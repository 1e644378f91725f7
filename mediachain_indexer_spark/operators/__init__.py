from mediachain_indexer_spark.operators.normalize import (  # noqa: F401
    normalize_documents,
    span_signature,
)
from mediachain_indexer_spark.operators.blocking import build_blocks  # noqa: F401
from mediachain_indexer_spark.operators.pairs import candidate_pairs  # noqa: F401
from mediachain_indexer_spark.operators.scoring import score_pairs  # noqa: F401
from mediachain_indexer_spark.operators.cluster import connected_components  # noqa: F401
