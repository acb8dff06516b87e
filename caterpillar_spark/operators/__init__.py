"""Engine operators: each is a pure ``DataFrame -> DataFrame`` transform,
the Spark-native replacement for the reference's ``task.Task`` interface
(``internal/pkg/pipeline/task/task.go:32-38``). Register new ops in
``REGISTRY`` the way the reference registers task types in
``supportedTasks`` (``internal/pkg/pipeline/tasks.go:37-59``)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

REGISTRY: dict[str, Callable[..., DataFrame]] = {}


def register(name: str):
    def deco(fn):
        REGISTRY[name] = fn
        return fn

    return deco


def _load_all() -> None:
    """Populate REGISTRY by importing every operator module (bottom import
    keeps the circular dependency one-way: modules only need `register`,
    which is already defined)."""
    from caterpillar_spark.operators import (  # noqa: F401
        compress,
        dedup,
        docs,
        multimodal,
        sampling,
        similarity,
        text,
    )


_load_all()
