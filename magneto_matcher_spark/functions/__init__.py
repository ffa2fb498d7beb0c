from magneto_matcher_spark.functions.cleaning import (  # noqa: F401
    BINARY_VALUES,
    NULL_REPRESENTATIONS,
    clean_column_name_expr,
    clean_df,
    clean_element_expr,
    is_binary_value_expr,
    null_normalize_expr,
    preprocess_string_expr,
    remove_invalid_characters_expr,
    split_camel_case_expr,
)
