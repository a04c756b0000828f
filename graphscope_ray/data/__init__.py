"""Training-data pipeline operators (beyond the reference's surface).

Deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search, text analysis, and multimodal
column plumbing — the operations a 100 TB training-data pipeline needs,
expressed as Ray Data batch transforms.
"""

from graphscope_ray.data.text import (  # noqa: F401
    bpe_encode,
    bpe_token_count,
    bpe_train,
    lm_score,
    quality_classifier,
    text_stats,
    token_count,
    quality_score,
    lang_id,
    fingerprint,
    tfidf_rows,
    tfidf_vectors,
)
from graphscope_ray.data.dedup import (  # noqa: F401
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
    ngram_jaccard_pairs,
    embedding_cosine_dedup,
    duplicated_spans,
)
from graphscope_ray.data.similarity import (  # noqa: F401
    ann_topk,
    kmeans_assign,
    knn_graph,
    lsh_ann_topk,
    ivf_pq_ann_topk,
    ivf_pq_index,
    pca_project,
    pq_ann_topk,
    pq_encode,
    pq_train,
    semantic_dedup,
)
from graphscope_ray.data.profile import column_profile  # noqa: F401
from graphscope_ray.data.curate import (  # noqa: F401
    adaptive_quality_filter,
    decontaminate,
    domain_mixture,
    hash_sample,
    normalize_text,
    pack_sequences,
    pii_scrub,
    repetition_stats,
    split_assign,
    training_order,
    vocab_topk,
    weighted_sample,
)
from graphscope_ray.data.heavyhitters import (  # noqa: F401
    exact_counts_of,
    mg_summary,
    mg_topk,
)
from graphscope_ray.data.text import bm25_scores  # noqa: F401
from graphscope_ray.data.sketch import (  # noqa: F401
    bloom_build,
    bloom_contains,
    bloom_fold,
    bloom_probe,
    cms_counts,
    cms_fold,
    cms_lookup,
    cms_rows,
    hll_distinct,
    hll_estimate,
    hll_fold,
    hll_register_rows,
    hll_register_rows_by_key,
    hll_registers,
)
