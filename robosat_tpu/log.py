"""Append-only file logging with optional console echo.

Parity: robosat/log.py:8-27 (same artifact: a line-per-message text file,
flushed per line, echoed to stdout).
"""

import os
import sys


class Log:
    def __init__(self, path, out=sys.stdout):
        self.out = out
        self.fp = open(path, "a")

    def log(self, msg):
        self.fp.write(msg + os.linesep)
        self.fp.flush()
        if self.out:
            print(msg, file=self.out)

    def close(self):
        if self.fp:
            self.fp.close()
            self.fp = None
