"""Failure alerting — the engine's analog of the reference's on-error
email (/root/reference/src/utils.py:194-211, wired at pipeline.py:66-68).

No SMTP in a data-plane library: an ``AlertHook`` is a callback registry
plus a durable file sink. Every fired alert is (1) appended as a JSON line
under ``<root>/alerts/``, (2) logged at ERROR, and (3) fanned out to any
registered callbacks (a real deployment registers a pager/webhook there;
tests register a list-appender). Firing never raises — an alerting failure
must not mask the original pipeline failure.
"""

from __future__ import annotations

import json
import logging
import os
import traceback
import uuid
from collections.abc import Callable
from dataclasses import dataclass, field

logger = logging.getLogger(__name__)

ALERTS_DIRNAME = "alerts"


@dataclass
class AlertHook:
    """On-failure hook for apply loops and the CLI entrypoint."""

    root: str  # table or job root; alerts land in <root>/alerts/
    job_name: str = "cdc_apply"
    callbacks: list[Callable[[dict], None]] = field(default_factory=list)

    def on_failure(self, cb: Callable[[dict], None]) -> "AlertHook":
        self.callbacks.append(cb)
        return self

    def fire(self, exc: BaseException, context: dict | None = None) -> dict:
        payload = {
            "job": self.job_name,
            "error_type": type(exc).__name__,
            "error": str(exc),
            "traceback": traceback.format_exc(),
            "context": context or {},
        }
        try:
            adir = os.path.join(self.root, ALERTS_DIRNAME)
            os.makedirs(adir, exist_ok=True)
            # unique name, exclusive create: concurrent jobs sharing a table
            # root (or a run after alert deletion) must never overwrite an
            # earlier alert record (a directory-count index would collide)
            name = f"alert-{uuid.uuid4().hex}.json"
            with open(os.path.join(adir, name), "x") as fh:
                json.dump(payload, fh)
        except Exception:
            logger.exception("alert file sink failed")
        logger.error("pipeline failure in %s: %s", self.job_name, payload["error"])
        for cb in self.callbacks:
            try:
                cb(payload)
            except Exception:
                logger.exception("alert callback failed")
        return payload


def read_alerts(root: str) -> list[dict]:
    adir = os.path.join(root, ALERTS_DIRNAME)
    if not os.path.isdir(adir):
        return []
    out = []
    for fn in sorted(os.listdir(adir)):
        if fn.endswith(".json"):
            with open(os.path.join(adir, fn)) as fh:
                out.append(json.load(fh))
    return out
