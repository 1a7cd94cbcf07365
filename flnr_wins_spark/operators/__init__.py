from flnr_wins_spark.operators.append import align_to_schema, append_no_test
from flnr_wins_spark.operators.asof import asof_join
from flnr_wins_spark.operators.decontam import contamination, decontaminate, word_ngrams
from flnr_wins_spark.operators.dedup import (
    exact_dedup,
    jaccard_pairs,
    minhash_lsh_pairs,
    shingle_sets,
    simhash_pairs,
    simhash_signatures,
    span_dedup,
)
from flnr_wins_spark.operators.enrich import enrich
from flnr_wins_spark.operators.frequency import frequency
from flnr_wins_spark.operators.graph import connected_components, dedup_clusters
from flnr_wins_spark.operators.interval import interval_join
from flnr_wins_spark.operators.merge import (
    merge_upsert,
    merge_upsert_evolve,
    scd2_apply,
    snapshot_diff,
)
from flnr_wins_spark.operators.packing import chunk_documents, pack_manifest, pack_sequences
from flnr_wins_spark.operators.reject import reject_duplicates, reject_unmatched
from flnr_wins_spark.operators.sample import stratified_sample
from flnr_wins_spark.operators.skew import salted_join
from flnr_wins_spark.operators.split import train_test_split
from flnr_wins_spark.operators.update import blank_to_null, conditional_update

__all__ = [
    "align_to_schema",
    "append_no_test",
    "asof_join",
    "blank_to_null",
    "chunk_documents",
    "conditional_update",
    "connected_components",
    "contamination",
    "decontaminate",
    "dedup_clusters",
    "enrich",
    "exact_dedup",
    "frequency",
    "interval_join",
    "jaccard_pairs",
    "merge_upsert",
    "merge_upsert_evolve",
    "minhash_lsh_pairs",
    "pack_manifest",
    "pack_sequences",
    "reject_duplicates",
    "reject_unmatched",
    "salted_join",
    "scd2_apply",
    "shingle_sets",
    "simhash_pairs",
    "simhash_signatures",
    "snapshot_diff",
    "span_dedup",
    "stratified_sample",
    "train_test_split",
    "word_ngrams",
]
