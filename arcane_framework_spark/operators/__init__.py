"""Operator surface: relational CDC ops + large-scale data-pipeline operators."""

from arcane_framework_spark.operators.dedup import (  # noqa: F401
    exact_dedup,
    incremental_minhash_pairs,
    minhash_band_rows,
    minhash_lsh_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_signatures,
)
from arcane_framework_spark.operators.multimodal import (  # noqa: F401
    decode_bmp,
    decode_image,
    decode_ppm,
    documents_as_assets,
    extract_features,
    image_decode_features,
    synth_image_assets,
)
from arcane_framework_spark.operators.relational import (  # noqa: F401
    changes_since,
    delta_join,
    latest_state,
)
from arcane_framework_spark.operators.similarity import (  # noqa: F401
    ann_banded_pairs,
    ann_lsh_pairs,
    hard_negatives,
    ivf_topk,
    knn_bruteforce,
    knn_bruteforce_vectorized,
    lsh_buckets,
    semantic_dedup,
)
from arcane_framework_spark.operators.cache import (  # noqa: F401
    cache_scope,
    scoped_persist,
)
from arcane_framework_spark.operators.graph import (  # noqa: F401
    connected_components,
    dedup_clusters,
)
from arcane_framework_spark.operators.packing import (  # noqa: F401
    pack_documents,
    pack_stats,
    select_by_budget,
)
from arcane_framework_spark.operators.rangejoin import range_join  # noqa: F401
from arcane_framework_spark.operators.sampling import (  # noqa: F401
    leakage_guarded_split,
    pps_systematic_sample,
    split_expr,
    with_split,
)
from arcane_framework_spark.operators.scale import (  # noqa: F401
    auto_salted_join,
    grouped_median,
    grouped_quantiles,
    salted_join,
    skew_report,
    with_broadcast_scalar,
)
from arcane_framework_spark.operators.temporal import asof_join  # noqa: F401
from arcane_framework_spark.operators.text import (  # noqa: F401
    with_fingerprint,
    with_language,
    with_text_stats,
)
