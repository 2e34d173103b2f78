"""Training-metric sinks.

Replaces the reference's logging stack (TextLoggerHook / Tensorboard /
WandB wiring / MyWechatLoggerHook, SURVEY.md section 5) with small
composable sinks fed by the train loop's metric dicts.
"""

from __future__ import annotations

import csv
import json
import os
import urllib.request
from typing import Dict, Optional


class CsvLogger:
    """Appends metric rows to ``<work_dir>/train_log.csv``."""

    def __init__(self, work_dir: str, filename: str = "train_log.csv"):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, filename)
        self._fieldnames = None

    def __call__(self, metrics: Dict[str, float]) -> None:
        write_header = self._fieldnames is None and not os.path.exists(
            self.path)
        if self._fieldnames is None:
            self._fieldnames = list(metrics)
        with open(self.path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=self._fieldnames,
                               extrasaction="ignore")
            if write_header:
                w.writeheader()
            w.writerow(metrics)


class WebhookLogger:
    """POSTs metric dicts as JSON to a webhook URL (the spiritual successor
    of the reference's WeChat loss-curve hook,
    ``models/fbbev/utils/wechat_logger.py``)."""

    def __init__(self, url: str, every: int = 1,
                 timeout: float = 2.0):
        self.url = url
        self.every = every
        self.timeout = timeout
        self._count = 0

    def __call__(self, metrics: Dict[str, float]) -> Optional[int]:
        self._count += 1
        if self._count % self.every:
            return None
        data = json.dumps(metrics).encode()
        req = urllib.request.Request(
            self.url, data=data,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.status
        except Exception:
            return None  # logging must never kill training
