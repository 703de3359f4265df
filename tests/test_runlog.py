"""Structured run logger (runlog.py) — reference logger.py parity pins."""

from __future__ import annotations

import logging

from data_engineering_challenge_spark import runlog


def test_success_level_registered_between_info_and_warning():
    assert logging.INFO < runlog.SUCCESS < logging.WARNING
    assert logging.getLevelName(runlog.SUCCESS) == "SUCCESS"


def test_file_handler_plain_and_overwritten(tmp_path):
    log = runlog.get_logger("runlog_test_a", log_dir=tmp_path, filename="a.log")
    log.info("first run line")
    log.success("step ok")
    text = (tmp_path / "a.log").read_text()
    assert "first run line" in text
    assert "SUCCESS" in text and "step ok" in text
    assert "\033[" not in text  # file log stays uncolored

    # Re-acquiring the same logger must not stack handlers (reference's
    # duplicate-handler guard) — handler count is stable.
    n = len(log.handlers)
    again = runlog.get_logger("runlog_test_a", log_dir=tmp_path, filename="a.log")
    assert again is log and len(again.handlers) == n


def test_overwrite_semantics(tmp_path):
    log = runlog.get_logger("runlog_test_b", log_dir=tmp_path, filename="b.log")
    log.info("old content")
    for h in list(log.handlers):
        h.close()
        log.removeHandler(h)
    log2 = runlog.get_logger("runlog_test_b", log_dir=tmp_path, filename="b.log")
    log2.info("new content")
    text = (tmp_path / "b.log").read_text()
    assert "new content" in text and "old content" not in text


def test_no_file_handler_without_log_dir():
    log = runlog.get_logger("runlog_test_c")
    assert not any(isinstance(h, logging.FileHandler) for h in log.handlers)
    log.success("console-only success path exercises the bound method")
