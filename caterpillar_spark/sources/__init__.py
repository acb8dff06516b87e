from caterpillar_spark.sources.files import (  # noqa: F401
    read_csv_records,
    read_files,
    read_json_array,
    read_jsonl,
    slugify_expr,
    write_records,
)
