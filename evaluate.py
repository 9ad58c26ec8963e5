#!/usr/bin/env python
"""Repo-root shim: `python evaluate.py task=walker-walk checkpoint=...`"""
from tdmpc2_tpu.evaluate import main

if __name__ == '__main__':
    main()
