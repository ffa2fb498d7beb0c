from magneto_matcher_spark.sources.changefeed import (  # noqa: F401
    generate_change_feed,
    with_schema_drift,
    write_change_files,
)
