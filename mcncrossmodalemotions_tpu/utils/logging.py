"""Progress/ETA logging utilities (zsvision ``zs_eta`` equivalents).

The reference logs throughput + ETA in every long loop
(fetch_emovoxceleb_imdb.m:122-136, compute_audio_feats.m:117-132).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path
from typing import Iterable, Iterator, Optional, TypeVar

T = TypeVar("T")


class Eta:
    """Throughput + ETA tracker for long loops."""

    def __init__(self, total: int, name: str = "", log_every: int = 50, file=None):
        self.total = total
        self.name = name
        self.log_every = max(1, log_every)
        self.start = time.monotonic()
        self.count = 0
        self.file = file or sys.stderr

    def tick(self, n: int = 1) -> None:
        self.count += n
        if self.count % self.log_every == 0 or self.count >= self.total:
            elapsed = time.monotonic() - self.start
            hz = self.count / max(elapsed, 1e-9)
            remaining = (self.total - self.count) / max(hz, 1e-9)
            print(
                f"[{self.name}] {self.count}/{self.total} "
                f"({hz:.1f} Hz, ETA {remaining:.0f}s)",
                file=self.file,
                flush=True,
            )


def progress(items: Iterable[T], total: Optional[int] = None, name: str = "",
             log_every: int = 50) -> Iterator[T]:
    """Wrap an iterable with ETA logging."""
    seq = list(items) if total is None else items
    total = total if total is not None else len(seq)  # type: ignore[arg-type]
    eta = Eta(total, name=name, log_every=log_every)
    for item in seq:
        yield item
        eta.tick()


class MetricsLogger:
    """Append-only JSONL metrics log (one record per epoch/step).

    TPU-native counterpart of the reference's ``extractStatsFn`` console
    output (run_distillation.m:186-207); records are machine-readable so
    analysis drivers can consume them.
    """

    def __init__(self, path: str | Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, record: dict) -> None:
        with self.path.open("a") as f:
            f.write(json.dumps(record, default=float) + "\n")

    def read(self) -> list[dict]:
        if not self.path.exists():
            return []
        with self.path.open() as f:
            return [json.loads(line) for line in f if line.strip()]
