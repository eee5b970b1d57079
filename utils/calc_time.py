#!/usr/bin/env python3
"""Thin wrapper: drop-in replacement for the reference utils/calc_time.py."""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from misti_tpu.cli.tools import calc_time_main

if __name__ == "__main__":
    sys.exit(calc_time_main())
