"""Logging helpers.  (API parity with ``pypmc/tools/util.py``.)"""

import logging

__all__ = ["log_to_stdout"]

_HANDLER_NAME = "pypmc_tpu_stdout_handler"


def log_to_stdout(verbose=False):
    """Install (idempotently) a stdout handler on the package logger;
    ``verbose`` switches the level from WARNING to INFO.

    In a multi-host (``jax.distributed``) run only process 0 logs below
    ERROR -- the host-0 orchestration role that replaces the reference's
    MPI rank-0 master (SURVEY.md section 5)."""
    import sys

    logger = logging.getLogger("pypmc_tpu")
    level = logging.INFO if verbose else logging.WARNING
    try:
        import jax
        from jax._src import xla_bridge

        # only consult the process topology if backends are already up --
        # asking earlier would force backend initialization at import time
        if (
            xla_bridge.backends_are_initialized()
            and jax.process_count() > 1
            and jax.process_index() != 0
        ):
            level = logging.ERROR
    except Exception:
        pass
    logger.setLevel(level)
    for handler in logger.handlers:
        if handler.get_name() == _HANDLER_NAME:
            handler.setLevel(level)
            return
    handler = logging.StreamHandler(sys.stdout)
    handler.set_name(_HANDLER_NAME)
    handler.setLevel(level)
    logger.addHandler(handler)
