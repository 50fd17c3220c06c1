"""Structured logging.

The reference writes a stdout banner + per-nuclide progress lines
(SURVEY.md section 5, observability). Here: std logging with an optional
JSON mode for machine consumption, selected by ``setup(json_mode=True)``
or the NDPP_TPU_LOG_JSON env var.
"""

from __future__ import annotations

import json
import logging
import os
import sys

_LOGGER_NAME = "ndpp_tpu"


class _JsonFormatter(logging.Formatter):
    def format(self, record: logging.LogRecord) -> str:
        payload = {
            "ts": self.formatTime(record),
            "level": record.levelname.lower(),
            "msg": record.getMessage(),
            "logger": record.name,
        }
        extra = getattr(record, "ndpp", None)
        if isinstance(extra, dict):
            payload.update(extra)
        return json.dumps(payload)


def setup(level: int = logging.INFO, json_mode: bool | None = None) -> logging.Logger:
    if json_mode is None:
        json_mode = bool(os.environ.get("NDPP_TPU_LOG_JSON"))
    logger = logging.getLogger(_LOGGER_NAME)
    logger.setLevel(level)
    logger.handlers.clear()
    handler = logging.StreamHandler(sys.stderr)
    if json_mode:
        handler.setFormatter(_JsonFormatter())
    else:
        handler.setFormatter(
            logging.Formatter("[%(asctime)s] %(levelname)s %(message)s", "%H:%M:%S")
        )
    logger.addHandler(handler)
    logger.propagate = False
    return logger


def get() -> logging.Logger:
    logger = logging.getLogger(_LOGGER_NAME)
    if not logger.handlers:
        setup()
    return logger
