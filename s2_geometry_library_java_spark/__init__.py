"""PySpark-native S2 spatial-join + tiling engine."""

from ._threads import limit_worker_threads

limit_worker_threads()
