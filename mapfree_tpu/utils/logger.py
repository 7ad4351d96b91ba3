"""stdout tee logger (reference lib/utils/logger.py:4-20)."""

from __future__ import annotations

import sys


class Logger:
    """Writes to both the terminal and a log file."""

    def __init__(self, filepath):
        self.terminal = sys.stdout
        self.log = open(filepath, "a")

    def write(self, message):
        self.terminal.write(message)
        self.log.write(message)

    def flush(self):
        self.terminal.flush()
        self.log.flush()


def set_log(filepath):
    sys.stdout = Logger(filepath)
