"""Logger configuration. Reference: ``nessai/utils/logging.py``."""

import logging
import os
import sys

__all__ = ["configure_logger"]


def configure_logger(
    output=None,
    label="nessai",
    log_level="INFO",
    filehandler_kwargs=None,
    stream=sys.stdout,
    include_logger_name: bool = False,
):
    """Configure the ``nessai_tpu`` logger with stream + file handlers.

    Mirrors the reference's bilby-style logger
    (``nessai/utils/logging.py:11``) for the ``nessai_tpu`` namespace:

    - ``label=None`` disables the file handler entirely;
    - ``label`` set with ``output=None`` writes ``<label>.log`` to the
      current working directory (the output directory is created if
      missing);
    - ``stream`` may be a file-like object, ``"stdout"``/``"stderr"``,
      or ``None`` (the ``logging.StreamHandler`` default, stderr).
    """
    if isinstance(log_level, str):
        try:
            level = getattr(logging, log_level.upper())
        except AttributeError:
            raise ValueError(f"log_level {log_level} not understood")
    else:
        level = int(log_level)

    logger = logging.getLogger("nessai_tpu")
    logger.setLevel(level)

    if include_logger_name:
        fmt = "%(asctime)s %(name)s %(levelname)-8s: %(message)s"
    else:
        fmt = "%(asctime)s nessai_tpu %(levelname)-8s: %(message)s"
    formatter = logging.Formatter(fmt, datefmt="%m-%d %H:%M")

    if isinstance(stream, str):
        if stream == "stdout":
            stream = sys.stdout
        elif stream == "stderr":
            stream = sys.stderr
        else:
            raise ValueError(f"Unknown stream: {stream}")

    if not any(
        isinstance(h, logging.StreamHandler)
        and not isinstance(h, logging.FileHandler)
        for h in logger.handlers
    ):
        sh = logging.StreamHandler(stream)
        sh.setFormatter(formatter)
        sh.setLevel(level)
        logger.addHandler(sh)

    if label:
        if output is None:
            output = os.getcwd()
        os.makedirs(output, exist_ok=True)
        log_file = os.path.join(output, f"{label}.log")
        if not any(
            isinstance(h, logging.FileHandler)
            and getattr(h, "baseFilename", None) == os.path.abspath(log_file)
            for h in logger.handlers
        ):
            if filehandler_kwargs is None:
                filehandler_kwargs = {}
            fh = logging.FileHandler(log_file, **filehandler_kwargs)
            fh.setFormatter(formatter)
            fh.setLevel(level)
            logger.addHandler(fh)

    for h in logger.handlers:
        h.setLevel(level)

    return logger
