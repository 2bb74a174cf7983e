"""Minimal local-filesystem stand-in for the `azfuse` package so the
reference CLI (which routes every file open through azfuse.File,
reference tsv_io.py:8, torch_common.py:5) can execute offline.  Only the
File methods the reference actually calls are provided; everything maps
straight to the local filesystem."""

import os
import os.path as op


class File(object):
    @staticmethod
    def open(path, mode="r"):
        d = op.dirname(path)
        if d and ("w" in mode or "a" in mode):
            os.makedirs(d, exist_ok=True)
        return open(path, mode)

    @staticmethod
    def isfile(path):
        return op.isfile(path)

    @staticmethod
    def prepare(paths):
        pass

    @staticmethod
    def get_file_size(path):
        return op.getsize(path)
