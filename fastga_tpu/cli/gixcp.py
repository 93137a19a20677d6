"""gixcp entry point (see gixxfer.py)."""
import sys

from .gixxfer import main_cp as main

if __name__ == "__main__":
    _common.cli_exit(main)
