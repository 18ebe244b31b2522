"""Logging helpers.  (API parity with ``pypmc/tools/util.py``.)"""

import logging

__all__ = ["log_to_stdout"]

_HANDLER_NAME = "pypmc_tpu_stdout_handler"


def log_to_stdout(verbose=False):
    """Install (idempotently) a stdout handler on the package logger;
    ``verbose`` switches the level from WARNING to INFO."""
    import sys

    logger = logging.getLogger("pypmc_tpu")
    level = logging.INFO if verbose else logging.WARNING
    logger.setLevel(level)
    for handler in logger.handlers:
        if handler.get_name() == _HANDLER_NAME:
            handler.setLevel(level)
            return
    handler = logging.StreamHandler(sys.stdout)
    handler.set_name(_HANDLER_NAME)
    handler.setLevel(level)
    logger.addHandler(handler)
