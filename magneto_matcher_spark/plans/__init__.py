from magneto_matcher_spark.plans.apply import (  # noqa: F401
    apply_batch_to_frame,
    dedup_max_lsn,
    merge_into_frame,
    normalize_payload,
)
