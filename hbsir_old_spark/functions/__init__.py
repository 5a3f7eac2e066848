"""Beyond-reference functions for large-scale training-data pipelines:
text analysis, deduplication, similarity search, multimodal columns.

Everything here is built from native pyspark.sql.functions (JVM-side,
codegen'd) unless physically impossible; the multimodal decode path is the
only Pandas-UDF surface. Where a function participates in the DuckDB oracle
gate, its formulation is deliberately portable (md5 + arithmetic, no
engine-specific hashes).
"""

from hbsir_old_spark.functions.text import (  # noqa: F401
    count_occurrences,
    doc_fingerprint,
    lang_id,
    quality_features,
    remove_boilerplate_lines,
    token_count,
    whitespace_tokens,
)
from hbsir_old_spark.functions.sampling import (  # noqa: F401
    assign_global_order,
    chunk_documents,
    salted_limit_per_group,
)
from hbsir_old_spark.functions.standard import bin_by_breaks  # noqa: F401
from hbsir_old_spark.functions.dedup import (  # noqa: F401
    build_fingerprint_bloom,
    dedup_against_bloom,
    exact_dedup,
    merge_blooms,
    minhash_band_hashes,
    minhash_lsh_pairs,
    near_dedup_against,
    ngram_jaccard_pairs,
    remove_duplicate_passages,
    simhash,
)
from hbsir_old_spark.functions.similarity import (  # noqa: F401
    cosine_similarity,
    cosine_topk,
    pq_encode,
    pq_topk,
    pq_train,
)
from hbsir_old_spark.functions.curation import (  # noqa: F401
    curate_corpus,
    curate_corpus_fuzzy,
)
from hbsir_old_spark.functions.bpe import (  # noqa: F401
    bpe_encode_by_vocab,
    bpe_train,
)
