"""Per-batch metrics log — LoggerManager parity (S21-S23).

The reference writes a multi-line block per micro-batch to a daily log file
(local FS ``./files/tbLog{yyyy-MM-dd}.log`` or HDFS /tmp/topics/…,
/root/reference/.../LoggerManager.scala:38-60, 71-101) containing batch
start/end wall-clock, distinct synced tables, record total, and
``rate = total / (end - start)`` rec/s formatted %.4f with a div-by-zero
guard (LoggerManager.scala:41-48).
"""

from __future__ import annotations

import datetime as dt
import os

from ..cdc import BatchMetrics


def _rate(total: int, seconds: float) -> str:
    # div-by-zero → raw total, matching LoggerManager.scala:44-47
    if seconds <= 0:
        return f"{total}"
    return f"{total / seconds:.4f}"


def format_batch_block(
    epoch_id: int, start: float, end: float, m: BatchMetrics
) -> str:
    fmt = "%Y-%m-%d %H:%M:%S"
    return (
        f"[ batch {epoch_id} ]\n"
        f"start_time: {dt.datetime.fromtimestamp(start).strftime(fmt)}\n"
        f"end_time: {dt.datetime.fromtimestamp(end).strftime(fmt)}\n"
        f"tables: {','.join(m.tables)}\n"
        f"total: {m.total}\n"
        f"dead_letters: {m.dead}\n"
        f"rate: {_rate(m.total, end - start)} records/s\n"
    )


def write_batch_log(
    metrics_dir: str, epoch_id: int, start: float, end: float, m: BatchMetrics
) -> str:
    """Append the block to the daily file; returns the path."""
    os.makedirs(metrics_dir, exist_ok=True)
    day = dt.date.today().isoformat()
    path = os.path.join(metrics_dir, f"tbLog{day}.log")
    with open(path, "a", encoding="utf-8") as f:
        f.write(format_batch_block(epoch_id, start, end, m))
    return path


def attach_progress_logger(spark, out_dir: str):
    """Engine-level metrics channel: a StreamingQueryListener appending
    every query-progress event as one JSON line (numInputRows,
    processedRowsPerSecond, state-operator memory, watermark …) to
    ``{out_dir}/progress-{query_name}.jsonl``. This is the cluster-side
    complement to the reference-parity text log above — DEPLOY.md points
    operators here for dashboards. Returns the listener; detach with
    ``spark.streams.removeListener(listener)``."""
    from pyspark.sql.streaming import StreamingQueryListener

    os.makedirs(out_dir, exist_ok=True)

    class _ProgressLogger(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            path = os.path.join(out_dir, f"progress-{p.name or p.id}.jsonl")
            with open(path, "a", encoding="utf-8") as f:
                f.write(p.json + "\n")

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = _ProgressLogger()
    spark.streams.addListener(listener)
    return listener


def observed(df, name: str, **metric_exprs):
    """Attach ``Observation`` metrics to a batch DataFrame: the metrics
    are computed DURING whatever action consumes the frame — zero extra
    jobs, unlike a separate ``.agg()`` pass (the reference's per-batch
    counts each cost a job; this is the free-rider upgrade). Returns
    ``(df, observation)``; read ``observation.get`` AFTER an action.

    For streams, pass the same exprs through ``DataFrame.observe`` and
    read ``query.lastProgress['observedMetrics'][name]`` — wired in
    ``attach_progress_logger``'s JSONL output when present."""
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, *[v.alias(k) for k, v in metric_exprs.items()]), obs
