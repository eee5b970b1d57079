#!/usr/bin/env python3
"""Thin wrapper: drop-in replacement for the reference utils/SCRM2JAFS.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from misti_tpu.cli.tools import scrm2jafs_main

if __name__ == "__main__":
    sys.exit(scrm2jafs_main())
