"""Process-aware logging (reference: cosmos_predict1/utils/log.py, loguru
wrapper with rank0_only filtering — here stdlib logging, JAX-process-aware).
"""

from __future__ import annotations

import logging
import os
import sys

_LOGGER = None


def _process_index() -> int:
    try:
        import jax

        return jax.process_index()
    except Exception:
        return int(os.environ.get("RANK", "0"))


def get_logger() -> logging.Logger:
    global _LOGGER
    if _LOGGER is None:
        logger = logging.getLogger("gen3c_tpu")
        if not logger.handlers:
            handler = logging.StreamHandler(sys.stdout)
            handler.setFormatter(
                logging.Formatter(
                    "[%(asctime)s %(levelname)s %(name)s] %(message)s",
                    datefmt="%H:%M:%S",
                )
            )
            logger.addHandler(handler)
            logger.setLevel(os.environ.get("GEN3C_LOG_LEVEL", "INFO"))
            logger.propagate = False  # avoid double prints via root logger
        _LOGGER = logger
    return _LOGGER


def info(msg: str, rank0_only: bool = True) -> None:
    if rank0_only and _process_index() != 0:
        return
    get_logger().info(msg)


def warning(msg: str, rank0_only: bool = True) -> None:
    if rank0_only and _process_index() != 0:
        return
    get_logger().warning(msg)


def debug(msg: str, rank0_only: bool = True) -> None:
    if rank0_only and _process_index() != 0:
        return
    get_logger().debug(msg)


def error(msg: str, rank0_only: bool = False) -> None:
    if rank0_only and _process_index() != 0:
        return
    get_logger().error(msg)
