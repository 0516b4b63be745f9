"""Rich progress UI (reference: utils/lightning_utils.py:32-110):
themed progress bar with a batches-processed column and a live metrics
text column, used by the eval CLI. Degrades to plain prints when rich is
unavailable."""

from __future__ import annotations

try:
    from rich.progress import (
        BarColumn,
        Progress,
        ProgressColumn,
        TextColumn,
        TimeRemainingColumn,
    )
    from rich.text import Text
    _HAVE_RICH = True
except ImportError:  # pragma: no cover
    _HAVE_RICH = False


THEME = {
    "description": "#FF4500",
    "progress_bar": "#f92672",
    "batch_progress": "#fc608a",
    "metrics": "#45ada2",
}


class RichProgressBarTheme:
    """Name-parity shim for the reference's style dataclass
    (lightning_utils.py:32-56) — same attribute names and defaults, so
    `RichProgressBarTheme.metrics`-style lookups migrate unchanged."""

    description = "#FF4500"
    progress_bar = "#f92672"
    progress_bar_finished = "#b7cc8a"
    progress_bar_pulse = "#f92672"
    batch_progress = "#fc608a"
    time = "#45ada2"
    processing_speed = "#DC143C"
    metrics = "#228B22"


if _HAVE_RICH:

    class BatchesProcessedColumn(ProgressColumn):
        """'n/total' column (lightning_utils.py:58-66)."""

        def render(self, task):
            total = "--" if task.total is None else int(task.total)
            return Text(f"{int(task.completed)}/{total}",
                        style=THEME["batch_progress"])

    class MetricsTextColumn(ProgressColumn):
        """Live metrics dict column (lightning_utils.py:69-87)."""

        def __init__(self):
            super().__init__()
            self._metrics = {}

        def update(self, metrics):
            self._metrics = metrics

        def render(self, task):
            text = " ".join(f"{k}: {v:.3f}" if isinstance(v, float)
                            else f"{k}: {v}"
                            for k, v in self._metrics.items())
            return Text(text, style=THEME["metrics"])

    def eval_progress(description="Testing"):
        """(progress, metrics_column) pair like audio_test.py:59-71."""
        metrics_col = MetricsTextColumn()
        progress = Progress(
            TextColumn(f"[bold blue]{description}", justify="right"),
            BarColumn(bar_width=None, complete_style=THEME["progress_bar"]),
            "•", BatchesProcessedColumn(), "•", TimeRemainingColumn(),
            "•", metrics_col)
        return progress, metrics_col

else:  # pragma: no cover

    class _NullColumn:
        def update(self, metrics):
            print(metrics)

    class _NullProgress:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def track(self, it, **kw):
            return it

        def add_task(self, *a, **kw):
            return 0

        def advance(self, *a, **kw):
            pass

    def eval_progress(description="Testing"):
        return _NullProgress(), _NullColumn()


# reference-name aliases (lightning_utils.py:58-110): the eval CLI used
# MyMetricsTextColumn; MyRichProgressBar was a Lightning training-UI
# subclass with no analog here (training progress is JSON rows)
if _HAVE_RICH:
    MyMetricsTextColumn = MetricsTextColumn
else:  # pragma: no cover
    MyMetricsTextColumn = _NullColumn
    BatchesProcessedColumn = _NullColumn
