"""Parameter-store sink/source — the reference's ``aws_parameter_store``
task (``internal/pkg/pipeline/task/aws/parameter_store/parameter_store.go:56-98``):
per record, extract a string per configured parameter name and
``PutParameter`` it (SecureString by default, overwrite by default);
``get`` reads parameters back for config/context use.

Spark-first mapping: the reference pushes ONE summary record (a
watermark, a row count, a latest-LSN) into SSM per pipeline run — the
publish side is driver-side metadata, never bulk data (the reference
itself forces task_concurrency=1 here). So ``publish_parameters``
collects the (tiny, by contract) DataFrame and puts each row's extracted
values in order — last row wins, matching the reference's record loop.
The client is injectable (``translate_text``/``fetch_sftp`` pattern):
anything with ``put_parameter(name, value, secure, overwrite)`` and
``get_parameter(name) -> str`` works; ``boto3_ssm_client`` adapts the
real SDK where installed (import-gated in this sandbox).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame

__all__ = [
    "publish_parameters",
    "put_parameters",
    "get_parameters",
    "boto3_ssm_client",
]

_MAX_PUBLISH_ROWS = 1000  # parameters are metadata; a big DF is a bug


def put_parameters(
    client, values: dict[str, str], secure: bool = True, overwrite: bool = True
) -> None:
    """Put explicit name->value pairs. Non-string values error, as in the
    reference (parameter_store.go:72-75)."""
    for name, value in values.items():
        if not isinstance(value, str):
            raise TypeError(f"{name} parameter value is not string")
        client.put_parameter(name, value, secure=secure, overwrite=overwrite)


def publish_parameters(
    client,
    df: DataFrame,
    set_map: dict[str, Column | str],
    secure: bool = True,
    overwrite: bool = True,
) -> int:
    """For each row of ``df`` (driver-collected; bounded — this is a
    metadata sink), put each ``set_map`` parameter with the value of its
    column expression (the reference's jq query per parameter). Returns
    the number of put calls."""
    from pyspark.sql import functions as F

    cols = [
        (F.col(c) if isinstance(c, str) else c).cast("string").alias(n)
        for n, c in set_map.items()
    ]
    rows = df.select(*cols).limit(_MAX_PUBLISH_ROWS + 1).collect()
    if len(rows) > _MAX_PUBLISH_ROWS:
        raise ValueError(
            f"publish_parameters got >{_MAX_PUBLISH_ROWS} rows; parameters "
            "are run-level metadata — aggregate first"
        )
    n = 0
    for r in rows:
        for name in set_map:
            v = r[name]
            if v is None:
                raise TypeError(f"{name} parameter value is not string")
            client.put_parameter(name, v, secure=secure, overwrite=overwrite)
            n += 1
    return n


def get_parameters(client, names: dict[str, str]) -> dict[str, str]:
    """Read parameters: {alias: parameter_name} -> {alias: value} (the
    reference's ``get`` map feeding config context)."""
    return {alias: client.get_parameter(name) for alias, name in names.items()}


def boto3_ssm_client(**session_kwargs):
    """Adapt boto3 SSM to the 2-method client protocol (import-gated)."""
    try:
        import boto3
    except ImportError as e:  # pragma: no cover - gated dependency
        raise RuntimeError(
            "boto3 is not installed; pass a custom client object with "
            "put_parameter/get_parameter"
        ) from e
    ssm = boto3.client("ssm", **session_kwargs)

    class _Boto3SSM:
        def put_parameter(self, name, value, secure=True, overwrite=True):
            ssm.put_parameter(
                Name=name,
                Value=value,
                Type="SecureString" if secure else "String",
                Overwrite=overwrite,
            )

        def get_parameter(self, name):
            resp = ssm.get_parameter(Name=name, WithDecryption=True)
            return resp["Parameter"]["Value"]

    return _Boto3SSM()
