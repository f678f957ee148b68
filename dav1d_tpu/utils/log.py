"""Logging hook (reference src/log.c: dav1d_log routes through
Dav1dSettings.logger.callback; a NULL callback silences output).

Settings.logger semantics here:
  None      -> default sink (stderr), like the reference's default
               stderr vfprintf logger (log.c:36-44)
  callable  -> called with the formatted message string
  False     -> suppressed (the reference's callback=NULL)
"""
from __future__ import annotations

import sys


def log(settings, msg: str) -> None:
    lg = getattr(settings, "logger", None) if settings is not None else None
    if lg is None:
        print(f"dav1d_tpu: {msg}", file=sys.stderr)
    elif callable(lg):
        lg(msg)
    # lg is False (or any non-callable sentinel): suppressed
