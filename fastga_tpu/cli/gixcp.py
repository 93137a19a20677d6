"""gixcp entry point (see gixxfer.py)."""
from . import _common
from .gixxfer import main_cp as main

if __name__ == "__main__":
    _common.cli_exit(main)
