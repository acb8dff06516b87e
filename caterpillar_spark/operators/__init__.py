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
