#!/usr/bin/env python
"""Repo-root shim: `python train.py task=walker-walk ...`"""
from tdmpc2_tpu.train import main

if __name__ == '__main__':
    main()
