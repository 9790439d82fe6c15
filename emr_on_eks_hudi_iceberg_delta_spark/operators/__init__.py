from .dedup import (
    connected_components,
    dedup_keep_canonical,
    embedding_near_dup_pairs,
    exact_dedup,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash,
)
from .merge import (
    MergeIntoBuilder,
    find_changed_current,
    scd2_apply_deletes,
    scd2_merge_delta_style,
    scd2_merge_hudi_style,
    scd2_merge_iceberg_style,
    upsert_by_key,
)
from .multimodal import (
    attach_binary_payload,
    decode_image_stub,
    extract_binary_features,
    sample_frames_stub,
)
from .sampling import (
    deterministic_sample,
    hash_bucket,
    hash_split,
    stratified_sample,
)
from .scale import salted_join, two_phase_agg
from .similarity import cosine_topk, ivf_topk, lsh_ann_pairs, lsh_ann_topk
from .temporal import asof_join, range_join_binned
from .text import (
    chunk_documents,
    pack_documents,
    with_fingerprints,
    with_lang_id,
    with_text_stats,
    with_token_count,
)

__all__ = [
    "MergeIntoBuilder",
    "asof_join",
    "attach_binary_payload",
    "chunk_documents",
    "connected_components",
    "cosine_topk",
    "decode_image_stub",
    "dedup_keep_canonical",
    "deterministic_sample",
    "embedding_near_dup_pairs",
    "exact_dedup",
    "extract_binary_features",
    "find_changed_current",
    "hash_bucket",
    "hash_split",
    "ivf_topk",
    "lsh_ann_pairs",
    "lsh_ann_topk",
    "lsh_candidate_pairs",
    "minhash_signatures",
    "ngram_jaccard_pairs",
    "pack_documents",
    "range_join_binned",
    "salted_join",
    "sample_frames_stub",
    "scd2_apply_deletes",
    "scd2_merge_delta_style",
    "scd2_merge_hudi_style",
    "scd2_merge_iceberg_style",
    "simhash",
    "stratified_sample",
    "two_phase_agg",
    "upsert_by_key",
    "with_fingerprints",
    "with_lang_id",
    "with_text_stats",
    "with_token_count",
]
