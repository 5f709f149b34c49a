"""Per-process logger (reference mmdet/utils/logger.py equivalent)."""

from __future__ import annotations

import logging
import sys
from typing import Optional

_initialized = set()


def get_root_logger(
    log_file: Optional[str] = None, log_level: int = logging.INFO
) -> logging.Logger:
    logger = logging.getLogger("htd_tpu")
    if "htd_tpu" in _initialized:
        return logger
    logger.setLevel(log_level)
    fmt = logging.Formatter(
        "%(asctime)s - %(name)s - %(levelname)s - %(message)s"
    )
    sh = logging.StreamHandler(sys.stdout)
    sh.setFormatter(fmt)
    logger.addHandler(sh)
    if log_file:
        try:
            import jax

            rank = jax.process_index()
        except Exception:
            rank = 0
        if rank == 0:
            fh = logging.FileHandler(log_file)
            fh.setFormatter(fmt)
            logger.addHandler(fh)
    _initialized.add("htd_tpu")
    return logger


def collect_env() -> dict:
    """Environment snapshot (reference collect_env equivalent)."""
    import platform

    info = {
        "python": sys.version.split()[0],
        "platform": platform.platform(),
    }
    try:
        import jax

        info["jax"] = jax.__version__
        info["devices"] = str(jax.devices())
        info["process_count"] = jax.process_count()
    except Exception as e:  # pragma: no cover
        info["jax"] = f"unavailable: {e}"
    try:
        import flax, optax  # noqa

        info["flax"] = flax.__version__
        info["optax"] = optax.__version__
    except Exception:
        pass
    return info
