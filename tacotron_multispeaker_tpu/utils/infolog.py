"""Timestamped file+stdout logging with optional webhook fan-out.

Mirrors the reference's ``util/infolog.py`` (SURVEY.md §2.11/§5): ``init``
opens a run log, ``log`` writes stamped lines to stdout and the file, and —
like the reference's Slack webhook — an optional HTTP webhook receives
messages flagged ``slack=True``.  Multi-host aware: only host 0 emits by
default.
"""

from __future__ import annotations

import atexit
import json
from datetime import datetime
from typing import IO
from urllib.request import Request, urlopen

_fmt = "%Y-%m-%d %H:%M:%S.%f"
_file: IO[str] | None = None
_run_name: str | None = None
_webhook_url: str | None = None
_enabled = True


def init(filename: str, run_name: str, webhook_url: str | None = None,
         enabled: bool = True) -> None:
    global _file, _run_name, _webhook_url, _enabled
    _close_logfile()
    _file = open(filename, "a", encoding="utf-8")
    _file.write("\n-----------------------------------------------------\n")
    _file.write(f"Starting new training run of {run_name}\n")
    _file.write("-----------------------------------------------------\n")
    _run_name = run_name
    _webhook_url = webhook_url
    _enabled = enabled


def log(msg: str, slack: bool = False) -> None:
    if not _enabled:
        return
    stamped = f"[{datetime.now().strftime(_fmt)[:-3]}]  {msg}"
    print(stamped, flush=True)
    if _file is not None:
        _file.write(stamped + "\n")
        _file.flush()
    if slack and _webhook_url is not None:
        _send_webhook(msg)


def _send_webhook(msg: str) -> None:
    try:
        body = json.dumps({"text": f"*{_run_name}*: {msg}"}).encode()
        req = Request(_webhook_url, data=body,
                      headers={"Content-Type": "application/json"})
        urlopen(req, timeout=5)
    except Exception as e:  # logging must never kill training
        print(f"(webhook send failed: {e})")


def _close_logfile() -> None:
    global _file
    if _file is not None:
        _file.close()
        _file = None


atexit.register(_close_logfile)
