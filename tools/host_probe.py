#!/usr/bin/env python
"""Snapshot the host's scaling health: pure-ALU and memory-streaming
2-vs-8 process controls (see BASELINE.md "memory-scaling phases").

Run before interpreting any scaling measurement on this host:
    python tools/host_probe.py
"""
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
from bench import _cpu_control, _mem_control  # noqa: E402

if __name__ == "__main__":
    print(json.dumps({**_cpu_control((2, 8)), **_mem_control((2, 8))}))
