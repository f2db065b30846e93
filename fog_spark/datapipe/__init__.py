from fog_spark.datapipe.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_candidates,
    near_dup_clusters,
    ngram_jaccard_pairs,
    simhash64,
    simhash_near_dups,
)
from fog_spark.datapipe.similarity import (  # noqa: F401
    brute_force_topk,
    embedding_near_dups,
    ivf_topk,
    lsh_ann_topk,
)
from fog_spark.datapipe.temporal import asof_join  # noqa: F401
from fog_spark.datapipe.text import (  # noqa: F401
    doc_fingerprints,
    language_id,
    quality_scores,
    token_stats,
)
