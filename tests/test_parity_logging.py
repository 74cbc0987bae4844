"""Reference-parity behaviour tests for ``utils.logging.configure_logger``.

Mirrors ``/root/reference/tests/test_utils/test_logging_utils.py``.
"""

import logging
import os
import sys

import numpy as np  # noqa: F401  (keeps import style consistent)
import pytest

from nessai_tpu.utils.logging import configure_logger


@pytest.fixture(autouse=True)
def reset_logger():
    logger = logging.getLogger("nessai_tpu")
    old = list(logger.handlers)
    for h in old:
        logger.removeHandler(h)
    yield
    for h in list(logger.handlers):
        h.close()
        logger.removeHandler(h)
    for h in old:
        logger.addHandler(h)


def test_configure_logger_no_label(tmp_path):
    output = tmp_path / "logger_dir"
    logger = configure_logger(label=None, output=str(output))
    assert not any(
        isinstance(h, logging.FileHandler) for h in logger.handlers
    )
    assert not os.path.exists(str(output / "nessai.log"))


@pytest.mark.parametrize("use_output", [True, False])
def test_configure_logger_with_label(tmp_path, use_output, monkeypatch):
    if use_output:
        output = tmp_path / "logger_dir"
        output.mkdir()
        logger = configure_logger(label="test", output=str(output))
    else:
        monkeypatch.chdir(tmp_path)
        output = tmp_path
        logger = configure_logger(label="test", output=None)
    log_path = os.path.join(str(output), "test.log")
    assert os.path.exists(log_path)
    assert any(isinstance(h, logging.FileHandler) for h in logger.handlers)


def test_configure_logger_with_mkdir(tmp_path):
    output = tmp_path / "logger_dir"
    configure_logger(label="test", output=str(output))
    assert os.path.exists(os.path.join(str(output), "test.log"))


@pytest.mark.parametrize(
    "log_level, value",
    [("ERROR", 40), ("WARNING", 30), ("INFO", 20), ("DEBUG", 10), (15, 15)],
)
def test_configure_logger_levels(log_level, value):
    logger = configure_logger(log_level=log_level, label=None)
    assert all(h.level == value for h in logger.handlers)


def test_configure_logger_unknown_level():
    with pytest.raises(ValueError) as excinfo:
        configure_logger(log_level="test", label=None)
    assert "log_level test not understood" in str(excinfo.value)


def test_filehandler_kwargs(tmp_path):
    output = tmp_path / "logger_dir"
    logger = configure_logger(
        output=str(output), filehandler_kwargs={"mode": "w"}
    )
    fh = [h for h in logger.handlers if isinstance(h, logging.FileHandler)]
    assert len(fh) == 1
    assert fh[0].mode == "w"


@pytest.mark.parametrize(
    "stream, expected",
    (
        ["stderr", sys.stderr],
        ["stdout", sys.stdout],
        [sys.stderr, sys.stderr],
    ),
)
def test_stream_handler_setting(tmp_path, stream, expected):
    output = tmp_path / "logger_dir"
    logger = configure_logger(
        output=str(output), stream=stream, label=None
    )
    sh = [
        h
        for h in logger.handlers
        if isinstance(h, logging.StreamHandler)
        and not isinstance(h, logging.FileHandler)
    ]
    assert len(sh) == 1
    assert sh[0].stream is expected


def test_stream_handler_none(tmp_path):
    # None -> logging.StreamHandler default (stderr)
    logger = configure_logger(
        output=str(tmp_path), stream=None, label=None
    )
    sh = [
        h
        for h in logger.handlers
        if isinstance(h, logging.StreamHandler)
        and not isinstance(h, logging.FileHandler)
    ]
    assert sh[0].stream is sys.stderr


def test_stream_handler_error(tmp_path):
    with pytest.raises(ValueError, match=r"Unknown stream: .*"):
        configure_logger(output=str(tmp_path), stream="not_a_stream")


@pytest.mark.parametrize("include_logger_name", [True, False])
def test_configure_logger_include_logger_name(
    tmp_path, include_logger_name
):
    logger = configure_logger(
        output=str(tmp_path), include_logger_name=include_logger_name
    )
    if include_logger_name:
        expected = "%(asctime)s %(name)s %(levelname)-8s: %(message)s"
    else:
        expected = "%(asctime)s nessai_tpu %(levelname)-8s: %(message)s"
    assert all(
        h.formatter._fmt == expected
        for h in logger.handlers
        if h.formatter is not None
    )
